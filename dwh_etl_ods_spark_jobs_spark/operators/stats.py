"""Exact-arithmetic bivariate statistics (corr / regression / stddev).

Spark's built-in ``corr``/``covar_samp``/``regr_slope`` accumulate
doubles, so results depend on partitioning and can never hash-match
another engine. These aggregates are refactored onto the repo's exact
integer discipline instead: 2-decimal inputs become cents (the
``_c100`` trick — ``round(x*100)`` has no .5 ties), ALL moment sums are
exact integer arithmetic (decimal(38,0) on Spark, HUGEINT on DuckDB),
and the classic closed forms

    corr  = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))
    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)

are evaluated as a fixed sequence of single IEEE ops on those exact
integers — deterministic under any partitioning, aggregation order, or
engine (same discipline as ``curation.bigram_lm_score``).

Scale: one map-side-combinable aggregation per group — the moments are
plain sums, so this is the cheapest possible shape (no window, no second
pass), and decimal(38,0) accumulators hold ~6·10⁹ rows of 1e7-cent
values with 5 orders of magnitude to spare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bivariate_stats",
    "bivariate_stats_sql",
    "robust_outlier_census",
    "robust_outlier_census_sql",
    "chi2_association",
    "chi2_association_sql",
    "target_encoding",
    "target_encoding_sql",
    "key_skew_profile",
    "key_skew_profile_sql",
    "rfm_quintiles",
    "rfm_quintiles_sql",
    "cusum_flags",
    "cusum_flags_sql",
    "gini_concentration",
    "gini_concentration_sql",
    "woe_iv_screen",
    "woe_iv_from_counts",
    "woe_iv_screen_sql",
    "cuped_adjusted_readout",
    "cuped_adjusted_readout_sql",
    "theil_sen_trend",
    "theil_sen_trend_sql",
]


def _cents(col: Column) -> Column:
    return F.round(col * 100, 0).cast("long")


def bivariate_stats(group_cols: list[str], x_col: str, y_col: str):
    """Per-group ``(n, mean_x, mean_y, stddev_x, stddev_y, corr_xy,
    slope, intercept)`` for two 2-decimal double columns, exact-integer
    moments, every float output rounded to 6 decimals.

    ``slope``/``intercept`` are the OLS fit y = slope·x + intercept in
    the ORIGINAL units (the cents scale cancels in the slope; the
    intercept divides back once).
    """

    def apply(df: DataFrame) -> DataFrame:
        x, y = _cents(F.col(x_col)), _cents(F.col(y_col))
        dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        # per-row products multiply in decimal too — x*x in BIGINT would
        # silently overflow for |values| beyond ~$30M (cents > ~3e9);
        # decimal(38,0)*decimal(38,0) keeps the whole envelope exact
        # (mirrors the DuckDB side's CAST(x AS HUGEINT) * x)
        agg = df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(dec(x) * dec(x)).alias("_sxx"),
            F.sum(dec(x) * dec(y)).alias("_sxy"),
            F.sum(dec(y) * dec(y)).alias("_syy"),
        )
        n_dec = dec(F.col("n"))
        cov_num = (n_dec * F.col("_sxy") - dec(F.col("_sx")) * dec(F.col("_sy"))).cast(
            "double"
        )
        varx_num = (n_dec * F.col("_sxx") - dec(F.col("_sx")) * dec(F.col("_sx"))).cast(
            "double"
        )
        vary_num = (n_dec * F.col("_syy") - dec(F.col("_sy")) * dec(F.col("_sy"))).cast(
            "double"
        )
        n_d = F.col("n").cast("double")
        slope_raw = cov_num / varx_num
        return agg.select(
            *group_cols,
            F.col("n"),
            F.round(F.col("_sx").cast("double") / n_d / F.lit(100.0), 6).alias("mean_x"),
            F.round(F.col("_sy").cast("double") / n_d / F.lit(100.0), 6).alias("mean_y"),
            F.round(
                F.sqrt(varx_num / (n_d * (n_d - F.lit(1.0)))) / F.lit(100.0), 6
            ).alias("stddev_x"),
            F.round(
                F.sqrt(vary_num / (n_d * (n_d - F.lit(1.0)))) / F.lit(100.0), 6
            ).alias("stddev_y"),
            F.round(cov_num / (F.sqrt(varx_num) * F.sqrt(vary_num)), 6).alias("corr_xy"),
            F.round(slope_raw, 6).alias("slope"),
            F.round(
                (F.col("_sy").cast("double") - slope_raw * F.col("_sx").cast("double"))
                / n_d
                / F.lit(100.0),
                6,
            ).alias("intercept"),
        )

    return apply


def bivariate_stats_sql(
    table: str, group_cols: list[str], x_expr: str, y_expr: str
) -> str:
    """DuckDB rendering — HUGEINT moment sums, the same op sequence."""
    g = ", ".join(group_cols)
    x = f"CAST(round(({x_expr}) * 100, 0) AS BIGINT)"
    y = f"CAST(round(({y_expr}) * 100, 0) AS BIGINT)"
    return f"""
WITH cents AS (SELECT {g}, {x} AS x, {y} AS y FROM {table}),
moms AS (
  SELECT {g}, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM cents GROUP BY {g}
),
nums AS (
  SELECT {g}, n,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS cov_num,
         CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) AS varx_num,
         CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS vary_num,
         CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d,
         CAST(n AS DOUBLE) AS n_d
  FROM moms
)
SELECT {g}, n,
       round(sx_d / n_d / 100.0, 6) AS mean_x,
       round(sy_d / n_d / 100.0, 6) AS mean_y,
       round(sqrt(varx_num / (n_d * (n_d - 1.0))) / 100.0, 6) AS stddev_x,
       round(sqrt(vary_num / (n_d * (n_d - 1.0))) / 100.0, 6) AS stddev_y,
       round(cov_num / (sqrt(varx_num) * sqrt(vary_num)), 6) AS corr_xy,
       round(cov_num / varx_num, 6) AS slope,
       round((sy_d - (cov_num / varx_num) * sx_d) / n_d / 100.0, 6) AS intercept
FROM nums
"""


def robust_outlier_census(group_cols: list[str], x_col: str, k: int = 3):
    """Per-group robust (median/MAD) outlier census: ``(group, n, med_c2,
    mad_c4, n_outliers)`` where a row is an outlier iff
    ``|x - median| > k * MAD`` — the standard robust alternative to
    z-scores (mean/stddev break down under the very outliers being
    hunted).

    Exactness: 2-decimal inputs become cents; medians of integers are
    exact halves, so ``med_c2 = 2*median`` and ``mad_c4 = 4*MAD`` are
    exact BIGINTs and the outlier rule becomes the pure integer
    comparison ``2*|2c - med_c2| > k * mad_c4`` — bit-identical on any
    engine or partitioning.

    Scale: two grouped exact percentiles + one census aggregation, all
    shuffling on the same group key (the exchange is reused). Spark's
    exact ``percentile`` holds a per-group value-count map — fine for
    bounded-cardinality metrics (prices, latencies in cents); for
    unbounded domains swap in ``approx_percentile`` or the HDR sketch
    (``sketches.hdr_histogram``) and keep the same integer rule.
    """

    def apply(df: DataFrame) -> DataFrame:
        c = F.round(F.col(x_col) * 100, 0).cast("long")
        # base feeds the median agg AND the deviation join; dev feeds the
        # MAD agg AND the census — localCheckpoint each (the ≥2×-reference
        # lineage discipline) so the fact is scanned ONCE, not four times
        # (plan audit: 4 parquet scans / 6 exchanges without, 1 scan with)
        base = df.select(*group_cols, c.alias("__c")).localCheckpoint(eager=False)
        med = base.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            (F.expr("percentile(__c, 0.5)") * 2).cast("long").alias("med_c2"),
        )
        dev = base.join(med, group_cols).select(
            *group_cols,
            F.col("n"),
            F.col("med_c2"),
            F.abs(F.lit(2) * F.col("__c") - F.col("med_c2")).alias("__abs2"),
        ).localCheckpoint(eager=False)
        mad = dev.groupBy(*group_cols).agg(
            (F.expr("percentile(__abs2, 0.5)") * 2).cast("long").alias("mad_c4")
        )
        return (
            dev.join(mad, group_cols)
            .groupBy(*group_cols)
            .agg(
                F.max("n").alias("n"),
                F.max("med_c2").alias("med_c2"),
                F.max("mad_c4").alias("mad_c4"),
                F.sum(
                    F.when(
                        F.lit(2) * F.col("__abs2") > F.lit(k) * F.col("mad_c4"), 1
                    ).otherwise(0)
                ).alias("n_outliers"),
            )
        )

    return apply


def robust_outlier_census_sql(
    table: str, group_cols: list[str], x_expr: str, k: int = 3
) -> str:
    """DuckDB rendering — quantile_cont on BIGINT cents interpolates the
    identical exact halves."""
    g = ", ".join(group_cols)
    return f"""
WITH cents AS (SELECT {g}, CAST(round(({x_expr}) * 100, 0) AS BIGINT) AS c FROM {table}),
med AS (
  SELECT {g}, count(*) AS n,
         CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med_c2
  FROM cents GROUP BY {g}
),
dev AS (
  SELECT cents.*, med.n, med.med_c2, abs(2 * c - med.med_c2) AS abs2
  FROM cents JOIN med USING ({g})
),
mad AS (
  SELECT {g}, CAST(quantile_cont(abs2, 0.5) * 2 AS BIGINT) AS mad_c4
  FROM dev GROUP BY {g}
)
SELECT {g}, max(n) AS n, max(med_c2) AS med_c2, max(mad_c4) AS mad_c4,
       CAST(sum(CASE WHEN 2 * abs2 > {k} * mad_c4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING ({g})
GROUP BY {g}
"""


def chi2_association(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, on the exact-integer discipline. One row out::

        (n, n_cells, dof, chi2_micro)

    Uses the identity ``chi2 = n * (SUM_cells obs^2/(rowtot*coltot) - 1)``
    so every per-cell term is ``(obs^2 * 1e9) div (rt*ct)`` — an exact
    integer nano-unit, decimal(38,0) products (obs^2*1e9 <= 1e27 for any
    n), quotient <= 1e9 (obs <= min(rt, ct)) so Spark's long-valued
    decimal ``div`` cannot overflow. The nano sum folds to micro at the
    end; floor bias is < n*n_cells*1e-9 chi2 units (0.1 at n=1e6,
    100 cells). NULL categories join the census as a NUL-sentinel
    value (first-class category, dof included).

    Scale: ONE shuffle on the (a, b) cell key (map-side combinable
    count); marginals derive from the cell frame (cells-sized, tiny) and
    join back broadcast; the grand total attaches via the data-derived
    constant-key broadcast idiom. Output chi2_micro fits BIGINT for
    n*min_cardinality up to ~9e12.
    """
    # NULL categories become a NUL sentinel BEFORE grouping: the marginal
    # joins below use null-rejecting equality in both engines, so a raw
    # NULL cell would silently drop from the term sum while still counting
    # in n — the sentinel keeps NULL a first-class category end to end
    nn = lambda c: F.coalesce(c.cast("string"), F.lit("\x00"))  # noqa: E731
    cells = (
        df.groupBy(nn(F.col(col_a)).alias("a"), nn(F.col(col_b)).alias("b"))
        .agg(F.count(F.lit(1)).alias("obs"))
        .localCheckpoint(eager=False)  # feeds marginals + totals + terms
    )
    rt = cells.groupBy("a").agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy("b").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(
        F.sum("obs").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct(F.col("a")) - 1)
            * (F.count_distinct(F.col("b")) - 1)
        ).alias("dof"),
        F.lit(1).alias("_k"),
    )
    term = F.expr(
        "CAST(CAST(obs AS decimal(38,0)) * CAST(obs AS decimal(38,0)) "
        "* 1000000000 AS decimal(38,0)) div "
        "CAST(CAST(rt AS decimal(38,0)) * CAST(ct AS decimal(38,0)) "
        "AS decimal(38,0))"
    )
    summed = (
        cells.join(F.broadcast(rt), "a")
        .join(F.broadcast(ct), "b")
        .select(term.alias("t"), F.lit(1).alias("_k"))
        .groupBy("_k")
        .agg(F.sum("t").alias("t_nano"))
    )
    out = summed.join(F.broadcast(tot), "_k")
    # clamp at the independence floor: per-cell floor rounding can push
    # t_nano a hair under 1e9 for perfectly independent data, and the two
    # engines disagree on NEGATIVE integer division (truncate vs floor) —
    # clamping keeps every division non-negative AND chi2 >= 0 by law
    chi2 = F.expr(
        "CAST(CAST(n AS decimal(38,0)) * (greatest(CAST(t_nano AS "
        "decimal(38,0)), CAST(1000000000 AS decimal(38,0))) - 1000000000) "
        "AS decimal(38,0)) div CAST(1000 AS decimal(38,0))"
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("dof").cast("long").alias("dof"),
        chi2.cast("long").alias("chi2_micro"),
    )


def chi2_association_sql(table_expr: str, a_expr: str, b_expr: str) -> str:
    """DuckDB rendering of :func:`chi2_association` — HUGEINT arithmetic,
    identical op order and floor divisions."""
    return f"""
WITH src AS (SELECT coalesce(CAST({a_expr} AS VARCHAR), chr(0)) AS a,
                    coalesce(CAST({b_expr} AS VARCHAR), chr(0)) AS b
             FROM {table_expr}),
cells AS (
  SELECT a, b, CAST(count(*) AS HUGEINT) AS obs FROM src GROUP BY a, b
),
rt AS (SELECT a, CAST(sum(obs) AS HUGEINT) AS rt FROM cells GROUP BY a),
ct AS (SELECT b, CAST(sum(obs) AS HUGEINT) AS ct FROM cells GROUP BY b),
tot AS (
  SELECT CAST(sum(obs) AS HUGEINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cells,
         CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT)
           AS dof
  FROM cells
),
terms AS (
  SELECT (obs * obs * 1000000000) // (rt.rt * ct.ct) AS t
  FROM cells JOIN rt USING (a) JOIN ct USING (b)
),
summed AS (SELECT CAST(sum(t) AS HUGEINT) AS t_nano FROM terms)
SELECT CAST(n AS BIGINT) AS n,
       n_cells,
       dof,
       CAST((n * (greatest(t_nano, CAST(1000000000 AS HUGEINT))
                  - 1000000000)) // 1000 AS BIGINT) AS chi2_micro
FROM summed, tot
"""


# ---------------------------------------------------------------------------
# Target encoding (m-estimate smoothed category mean) — ML feature prep
# ---------------------------------------------------------------------------

def target_encoding(
    df: DataFrame, cat_col: str, y: Column, m: int
) -> DataFrame:
    """Smoothed mean (m-estimate) target encoding per category::

        enc_micro = (sum_y·10⁶ + m·global_mean_micro) div (n + m)

    ``y`` must be an integer 0/1 Column (a predicate cast); all
    arithmetic is exact integer micro-units so the encoding is
    deterministic and hash-matches any SQL engine (Micci-Barreca, SIGKDD
    Expl. 2001 — the standard high-cardinality categorical encoder).

    Returns ``(category, n, sum_y, enc_micro)``. Scale: ONE map-side
    combinable aggregation over the data; the global mean comes from a
    second aggregation of the tiny per-category frame, attached back via
    a constant-key broadcast hash join (never a cross join). Categories
    unseen at apply time take the global prior — exposed here as the
    fallback value ``enc_micro`` of an all-categories row the caller can
    union if needed.
    """
    per_cat = (
        df.select(F.col(cat_col).alias("category"), y.cast("long").alias("_y"))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("sum_y"),
        )
        .localCheckpoint(eager=False)  # referenced twice below
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    totals = (
        per_cat.agg(
            F.sum("n").cast("long").alias("_n_t"),
            F.sum("sum_y").cast("long").alias("_y_t"),
        )
        .select(
            F.expr("(_y_t * 1000000) div _n_t").alias("_gm"),
        )
        .withColumn("_one", one)
    )
    return (
        per_cat.withColumn("_one", one)
        .join(F.broadcast(totals), "_one")
        .select(
            "category",
            "n",
            "sum_y",
            F.expr(f"(sum_y * 1000000 + {m} * _gm) div (n + {m})").alias(
                "enc_micro"
            ),
        )
    )


def target_encoding_sql(table_expr: str, cat_expr: str, y_pred: str, m: int) -> str:
    """DuckDB rendering of :func:`target_encoding` (same integer ops)."""
    return f"""
WITH per_cat AS (
  SELECT {cat_expr} AS category,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {y_pred} THEN 1 ELSE 0 END) AS BIGINT) AS sum_y
  FROM {table_expr} GROUP BY 1
),
g AS (
  SELECT CAST((sum(sum_y) * 1000000) // sum(n) AS BIGINT) AS gm FROM per_cat
)
SELECT category, n, sum_y,
       CAST((sum_y * 1000000 + {m} * gm) // (n + {m}) AS BIGINT) AS enc_micro
FROM per_cat, g
"""


# ---------------------------------------------------------------------------
# Key-skew profile — the pre-shuffle diagnostic that decides salting
# ---------------------------------------------------------------------------

def key_skew_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row shuffle-skew diagnostic for a prospective join/agg key::

        (n_rows, n_keys, max_per_key, skew_x_micro, top_key)

    ``skew_x_micro`` = max_per_key · n_keys · 10⁶ div n_rows — how many
    times hotter the hottest key runs vs a uniform spread (1.0 == 10⁶).
    The number that decides whether a planned shuffle on ``key_cols``
    needs salting (``operators.skew``) or AQE skew-join before it runs at
    100 TB. Scale: one map-side-combinable count per key + aggregation of
    the key frame; the argmax key resolves by the portable two-step rule
    (max count, then MIN key string) — deterministic across engines.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = (
        df.select(key.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # referenced twice below
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_per_key"),
    ).withColumn("_one", one)
    return (
        counts.withColumn("_one", one)
        .join(F.broadcast(stats), "_one")
        .filter(F.col("n") == F.col("max_per_key"))
        .groupBy("n_rows", "n_keys", "max_per_key")
        .agg(F.min("k").alias("top_key"))
        .select(
            "n_rows",
            "n_keys",
            "max_per_key",
            F.expr("(max_per_key * n_keys * 1000000) div n_rows").alias(
                "skew_x_micro"
            ),
            "top_key",
        )
    )


def key_skew_profile_sql(table_expr: str, key_exprs: list[str]) -> str:
    """DuckDB rendering of :func:`key_skew_profile`."""
    key = "concat_ws('|', " + ", ".join(
        f"CAST({e} AS VARCHAR)" for e in key_exprs
    ) + ")"
    return f"""
WITH counts AS (
  SELECT {key} AS k, CAST(count(*) AS BIGINT) AS n
  FROM {table_expr} GROUP BY 1
),
s AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_per_key
  FROM counts
)
SELECT n_rows, n_keys, max_per_key,
       CAST((max_per_key * n_keys * 1000000) // n_rows AS BIGINT)
         AS skew_x_micro,
       (SELECT min(k) FROM counts, s WHERE counts.n = s.max_per_key)
         AS top_key
FROM s
"""


# ---------------------------------------------------------------------------
# RFM quintile features (recency / frequency / monetary customer scoring)
# ---------------------------------------------------------------------------

def rfm_quintiles(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    amount_cents: Column,
    n_q: int = 5,
) -> DataFrame:
    """Classic RFM feature build: per entity, recency (days before the
    dataset's max date), frequency (row count), monetary (exact cent
    sum), each cut into ``n_q`` exact equal-frequency quantiles via the
    distributed global rank (``operators/rank.py`` — no single-partition
    ORDER BY anywhere). Returns::

        (entity, recency_days, n_orders, cents, r_q, f_q, m_q)

    with quantiles 1..n_q; recency ranks ASCENDING (fewest days = best =
    highest r_q by the standard marketing convention: r_q = n_q - bin).
    The anchor date is data-derived (max date), attached by constant-key
    broadcast. Scale: one entity aggregation + three bounded-range rank
    passes over the ENTITY frame (already reduced from transactions).
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_bin

    per = df.groupBy(F.col(entity_col).alias("entity")).agg(
        F.max(F.col(date_col)).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(amount_cents).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)  # referenced twice (anchor + features)
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    anchor = per.agg(F.max("_last").alias("_anchor")).withColumn("_one", one)
    feats = (
        per.withColumn("_one", one)
        .join(F.broadcast(anchor), "_one")
        .select(
            "entity",
            F.datediff(F.col("_anchor"), F.col("_last")).cast("long").alias(
                "recency_days"
            ),
            "n_orders",
            "cents",
        )
    )
    return (
        feats.transform(quantile_bin(["recency_days", "entity"], n_q, out_col="_rb"))
        .transform(quantile_bin(["n_orders", "entity"], n_q, out_col="_fb"))
        .transform(quantile_bin(["cents", "entity"], n_q, out_col="_mb"))
        .select(
            "entity",
            "recency_days",
            "n_orders",
            "cents",
            (F.lit(n_q) - F.col("_rb")).cast("int").alias("r_q"),
            (F.col("_fb") + 1).cast("int").alias("f_q"),
            (F.col("_mb") + 1).cast("int").alias("m_q"),
        )
    )


def rfm_quintiles_sql(
    table_expr: str,
    entity_expr: str,
    date_expr: str,
    cents_expr: str,
    n_q: int = 5,
) -> str:
    """DuckDB rendering of :func:`rfm_quintiles` (row_number quantile
    formula, same tie-breaks)."""
    return f"""
WITH per AS (
  SELECT {entity_expr} AS entity,
         max({date_expr}) AS last_d,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum({cents_expr}) AS BIGINT) AS cents
  FROM {table_expr} GROUP BY 1
),
a AS (SELECT max(last_d) AS anchor FROM per),
feats AS (
  SELECT entity,
         CAST(datediff('day', last_d, anchor) AS BIGINT) AS recency_days,
         n_orders, cents
  FROM per, a
),
ranked AS (
  SELECT *,
    (row_number() OVER (ORDER BY recency_days, entity) - 1) * {n_q}
      // count(*) OVER () AS rb,
    (row_number() OVER (ORDER BY n_orders, entity) - 1) * {n_q}
      // count(*) OVER () AS fb,
    (row_number() OVER (ORDER BY cents, entity) - 1) * {n_q}
      // count(*) OVER () AS mb
  FROM feats
)
SELECT entity, recency_days, n_orders, cents,
       CAST({n_q} - rb AS INT) AS r_q,
       CAST(fb + 1 AS INT) AS f_q,
       CAST(mb + 1 AS INT) AS m_q
FROM ranked
"""


# ---------------------------------------------------------------------------
# CUSUM change-point flags (drift detection over a daily series)
# ---------------------------------------------------------------------------

def cusum_flags(
    df: DataFrame, day_col: str, cents_col: str, threshold_x_micro: int
) -> DataFrame:
    """Page's CUSUM over a (day, cents) series, exact integers: the
    running sum of scaled deviations ``cents·n − total`` (i.e. the
    deviation from the global mean, scaled by n so no fraction ever
    materializes); a day is flagged when |cusum| exceeds
    ``threshold_x_micro``·10⁻⁶ of the |total|·n envelope::

        (day, cents, cusum_scaled, flagged)

    Scale: the series is an already-aggregated DAILY frame (bounded by
    calendar days, not rows) — the ordered running-sum window is bounded
    the same way; the global total attaches by constant-key broadcast.
    """
    from pyspark.sql import Window

    series = (
        df.groupBy(F.col(day_col).alias("day"))
        .agg(F.sum(F.col(cents_col)).cast("long").alias("cents"))
        .localCheckpoint(eager=False)  # referenced twice below
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    tot = series.agg(
        F.sum("cents").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    ).withColumn("_one", one)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        series.withColumn("_one", one)
        .join(F.broadcast(tot), "_one")
        .withColumn(
            "cusum_scaled",
            F.sum(
                (F.col("cents") * F.col("_n") - F.col("_total")).cast(
                    "decimal(38,0)"
                )
            ).over(w).cast("long"),
        )
        .select(
            "day",
            "cents",
            "cusum_scaled",
            (
                F.abs(F.col("cusum_scaled"))
                * F.lit(1_000_000)
                > F.lit(threshold_x_micro) * F.abs(F.col("_total")) * F.col("_n")
            ).cast("int").alias("flagged"),
        )
    )


def cusum_flags_sql(
    table_expr: str, day_expr: str, cents_expr: str, threshold_x_micro: int
) -> str:
    """DuckDB rendering of :func:`cusum_flags`."""
    return f"""
WITH series AS (
  SELECT {day_expr} AS day, CAST(sum({cents_expr}) AS BIGINT) AS cents
  FROM {table_expr} GROUP BY 1
),
t AS (
  SELECT CAST(sum(cents) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n
  FROM series
)
SELECT day, cents,
       CAST(sum(cents * n - total) OVER
            (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cusum_scaled,
       CAST(CASE WHEN abs(CAST(sum(cents * n - total) OVER
                 (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT))
                 * 1000000 > {threshold_x_micro} * abs(total) * n
            THEN 1 ELSE 0 END AS INT) AS flagged
FROM series, t
"""


# ---------------------------------------------------------------------------
# Categorical entropy (class-balance / diversity signal)
# ---------------------------------------------------------------------------

def categorical_entropy(
    df: DataFrame, group_cols: list[str], cat_col: str
) -> DataFrame:
    """Shannon entropy (nats) of a categorical column per group::

        (group..., n_rows, n_cats, entropy_micro)

    ``entropy_micro = Σ_cat round(-(n_c/n)·ln(n_c/n)·10⁶)`` — each term a
    FIXED sequence of single IEEE ops on exact integer counts, rounded to
    integer micro-nats BEFORE the sum (the PMI/bigram-LM float
    discipline: aggregation order can never perturb the result). NULL
    categories count as a category. The class-balance monitor for
    training mixes: 0 = one class, ln(k)·10⁶ = uniform over k.

    Scale: one (group, cat) count + one group fold — both
    map-side-combinable; group totals attach via a same-key join (no
    second scan of the data).
    """
    counts = (
        df.groupBy(
            *[F.col(c) for c in group_cols],
            F.col(cat_col).alias("_cat"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n_c"))
        .localCheckpoint(eager=False)  # totals + terms read it twice
    )
    totals = counts.groupBy(*group_cols).agg(
        F.sum("_n_c").cast("long").alias("_n")
    )
    p = F.col("_n_c").cast("double") / F.col("_n").cast("double")
    term = F.round(-(p * F.log(p)) * F.lit(1000000.0)).cast("long")
    if group_cols:
        # NULL-SAFE join: a plain equi-join would drop every group whose
        # key is NULL while the SQL rendering (IS NOT DISTINCT FROM) keeps
        # them (ADVICE r8). NULL is a legitimate group in this operator.
        c_al, t_al = counts.alias("_c"), totals.alias("_t")
        cond = None
        for g in group_cols:
            eq = F.col(f"_c.{g}").eqNullSafe(F.col(f"_t.{g}"))
            cond = eq if cond is None else (cond & eq)
        joined = c_al.join(t_al, cond).select(
            *[F.col(f"_c.{g}") for g in group_cols],
            F.col("_c._n_c"),
            F.col("_t._n"),
        )
    else:
        # global entropy: constant-key broadcast attach (HASH join, never
        # a nested loop)
        one = F.pmod(F.hash(F.lit(1)), F.lit(1))
        joined = counts.withColumn("_one", one).join(
            F.broadcast(totals.withColumn("_one", one)), "_one"
        )
    return joined.withColumn("_term", term).groupBy(
        *group_cols, "_n"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_cats"),
        F.sum("_term").cast("long").alias("entropy_micro"),
    ).select(
        *group_cols,
        F.col("_n").alias("n_rows"),
        "n_cats",
        "entropy_micro",
    )


def categorical_entropy_sql(
    table_expr: str, group_exprs: list[str], cat_expr: str
) -> str:
    """DuckDB rendering of :func:`categorical_entropy` (same count-exact
    terms, same single-op float sequence, same per-term rounding)."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    join_on = " AND ".join(
        f"counts.{e} IS NOT DISTINCT FROM totals.{e}" for e in group_exprs
    ) or "TRUE"
    return f"""
WITH counts AS (
  SELECT {gsel}{cat_expr} AS cat, CAST(count(*) AS BIGINT) AS n_c
  FROM {table_expr} GROUP BY {gsel}cat
),
totals AS (
  SELECT {gsel}CAST(sum(n_c) AS BIGINT) AS n FROM counts {gby or 'GROUP BY ()'}
),
terms AS (
  SELECT {("counts." + ", counts.".join(group_exprs) + ", ") if group_exprs else ""}n,
         CAST(round(-((CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000.0)
              AS BIGINT) AS term
  FROM counts JOIN totals ON {join_on}
)
SELECT {gsel}n AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cats,
       CAST(sum(term) AS BIGINT) AS entropy_micro
FROM terms GROUP BY {gsel}n
"""


def mutual_information(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information (micro-nats) between two categorical columns::

        (n_rows, n_cells, mi_micro)

    ``mi_micro = Σ_{x,y} round((c_xy/N)·ln(c_xy·N / (c_x·c_y))·10⁶)`` —
    the dependence counterpart to the chi² monitor (chi² scores the
    DEVIATION from independence in count units; MI scores it in
    information units, the quantity feature-selection and leakage
    screens threshold on). Each term is a fixed sequence of single IEEE
    ops on exact integer counts, rounded to integer micro-nats BEFORE
    the sum — the entropy/PMI float discipline, so aggregation order can
    never perturb the result. NULL categories count as categories
    (null-safe marginal joins).

    Scale: one (x, y) count (map-side combinable), two marginal folds
    OVER THE JOINT COUNTS (never a second scan of the data), equi-joins
    on the marginal keys, and a constant-key broadcast of the 1-row
    total. State is O(|X|·|Y|), row-count independent.
    """
    joint = (
        df.groupBy(F.col(col_x).alias("_x"), F.col(col_y).alias("_y"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)  # marginals + terms read it thrice
    )
    mx = joint.groupBy("_x").agg(F.sum("_c").cast("long").alias("_cx"))
    my = joint.groupBy("_y").agg(F.sum("_c").cast("long").alias("_cy"))
    tot = joint.groupBy().agg(F.sum("_c").cast("long").alias("_n"))
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    j = (
        joint.alias("_j")
        .join(mx.alias("_mx"), F.col("_j._x").eqNullSafe(F.col("_mx._x")))
        .join(my.alias("_my"), F.col("_j._y").eqNullSafe(F.col("_my._y")))
        .select(F.col("_j._c").alias("_c"), "_cx", "_cy")
        .withColumn("_one", one)
        .join(F.broadcast(tot.withColumn("_one", one)), "_one")
    )
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    ratio = (F.col("_c").cast("double") * F.col("_n").cast("double")) / (
        F.col("_cx").cast("double") * F.col("_cy").cast("double")
    )
    term = F.round(p * F.log(ratio) * F.lit(1000000.0)).cast("long")
    return (
        j.withColumn("_term", term)
        .groupBy("_n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("_term").cast("long").alias("mi_micro"),
        )
        .select(F.col("_n").alias("n_rows"), "n_cells", "mi_micro")
    )


def mutual_information_sql(table_expr: str, x_expr: str, y_expr: str) -> str:
    """DuckDB rendering of :func:`mutual_information` (same count-exact
    terms, same single-op float sequence, same per-term rounding)."""
    return f"""
WITH joint AS (
  SELECT {x_expr} AS x, {y_expr} AS y, CAST(count(*) AS BIGINT) AS c
  FROM {table_expr} GROUP BY 1, 2
),
mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM joint GROUP BY 1),
my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM joint GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
terms AS (
  SELECT c, n,
         CAST(round(((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
              * ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                   / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))))
              * 1000000.0) AS BIGINT) AS term
  FROM joint
  JOIN mx ON joint.x IS NOT DISTINCT FROM mx.x
  JOIN my ON joint.y IS NOT DISTINCT FROM my.y
  CROSS JOIN tot
)
SELECT n AS n_rows, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(term) AS BIGINT) AS mi_micro
FROM terms GROUP BY n
"""


def winsorized_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    trim_pct: int = 5,
) -> DataFrame:
    """Winsorized + trimmed sums per group — the robust aggregate pair
    monitoring pipelines want when a few fat-finger rows poison a plain
    mean::

        (group..., n, k, lo_val, hi_val, winsor_sum, trim_sum, n_mid)

    With per-group order ``(value_col, key_col)`` (unique tie-break) and
    ``k = n·trim_pct div 100``: the k smallest rows clamp to ``lo_val``
    (the value at rank k+1), the k largest clamp to ``hi_val`` (rank
    n-k), so ``winsor_sum = Σ middle + k·(lo_val+hi_val)`` and
    ``trim_sum`` drops the tails outright (``n_mid = n-2k`` rows). Pure
    integer arithmetic on an integer value column (use cents).

    Scale: per-group ranks come from :func:`grouped_global_rank` — the
    range-decomposed rank, NOT a per-group window — so five giant groups
    do not become five stragglers; the final fold is one
    map-side-combinable groupBy. Bounded group cardinality assumed (the
    rank's offsets frame is O(ranges·groups)).
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import grouped_global_rank

    ranked = df.transform(
        grouped_global_rank(
            group_cols, [value_col, key_col], out_col="_rk0",
            with_total="_n",
        )
    ).withColumn("_rn", F.col("_rk0") + F.lit(1))
    k = F.expr(f"CAST((_n * {trim_pct}) div 100 AS BIGINT)")
    v = F.col(value_col).cast("long")
    mid = (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
    return (
        ranked.withColumn("_k", k)
        .groupBy(*group_cols)
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.max("_k").cast("long").alias("k"),
            F.max(F.when(F.col("_rn") == F.col("_k") + 1, v)).cast("long").alias("lo_val"),
            F.max(F.when(F.col("_rn") == F.col("_n") - F.col("_k"), v)).cast("long").alias("hi_val"),
            F.sum(F.when(mid, v).otherwise(F.lit(0))).cast("long").alias("_mid_sum"),
        )
        .select(
            *group_cols,
            "n",
            "k",
            "lo_val",
            "hi_val",
            (F.col("_mid_sum") + F.col("k") * (F.col("lo_val") + F.col("hi_val")))
            .cast("long")
            .alias("winsor_sum"),
            F.col("_mid_sum").alias("trim_sum"),
            (F.col("n") - F.lit(2) * F.col("k")).cast("long").alias("n_mid"),
        )
    )


def winsorized_stats_sql(
    table_expr: str,
    group_exprs: list[str],
    value_expr: str,
    key_expr: str,
    trim_pct: int = 5,
) -> str:
    """DuckDB rendering of :func:`winsorized_stats` (plain per-group
    windows — the single-node collapse of the grouped range
    decomposition, value-identical)."""
    g = ", ".join(group_exprs)
    return f"""
WITH ranked AS (
  SELECT {g}, CAST({value_expr} AS BIGINT) AS v,
         row_number() OVER (PARTITION BY {g} ORDER BY {value_expr}, {key_expr})
           AS rn,
         CAST(count(*) OVER (PARTITION BY {g}) AS BIGINT) AS n
  FROM {table_expr}
),
flagged AS (SELECT *, (n * {trim_pct}) // 100 AS k FROM ranked),
agg AS (
  SELECT {g},
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(k) AS BIGINT) AS k,
         CAST(max(CASE WHEN rn = k + 1 THEN v END) AS BIGINT) AS lo_val,
         CAST(max(CASE WHEN rn = n - k THEN v END) AS BIGINT) AS hi_val,
         CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN v ELSE 0 END)
              AS BIGINT) AS mid_sum
  FROM flagged GROUP BY {g}
)
SELECT {g}, n, k, lo_val, hi_val,
       CAST(mid_sum + k * (lo_val + hi_val) AS BIGINT) AS winsor_sum,
       mid_sum AS trim_sum,
       CAST(n - 2 * k AS BIGINT) AS n_mid
FROM agg
"""


# --- deterministic Poisson bootstrap (r11) ---------------------------------

# Poisson(1) CDF thresholds scaled to 2^60 (the md5_long range), exact
# integer literals computed once in Python — both engines compare the
# same 60-bit hash to the same constants, so every replicate weight is
# reproducible and engine-identical. P(X > 6) ≈ 1e-4 truncates to 6.
BOOT_POISSON_CDF_2_60 = [
    424136118829305344,    # P(X <= 0)
    848272237658610688,    # P(X <= 1)
    1060340297073263360,   # P(X <= 2)
    1131029650211480960,   # P(X <= 3)
    1148701988496035328,   # P(X <= 4)
    1152236456152946176,   # P(X <= 5)
]
BOOT_LO_IDX_PPM = 50_000   # 5th percentile
BOOT_HI_IDX_PPM = 950_000  # 95th percentile

# md5 + hex->int conversion are the bootstrap's CPU bill (string ops
# per cell), so each digest feeds FOUR replicates through exactly TWO
# string convs: the 32 hex chars parse as two 60-bit BIGINTs (chars
# 1-15 / 17-31, the md5_long slice twice), each splitting into two
# 30-bit lanes by integer div/mod; the CDF rescales to 2^30 (floor
# shift — 2^-30 threshold quantization is immaterial to a bootstrap).
# Measured 11.5 -> ~3 s at sf0.1 (B=40).
BOOT_POISSON_CDF_2_30 = [t >> 30 for t in BOOT_POISSON_CDF_2_60]
_BOOT_LANES = 4
_BOOT_LANE_MOD = 1 << 30


def _boot_weight_expr(u: "Column") -> "Column":
    w = F.lit(6).cast("long")
    for k in reversed(range(len(BOOT_POISSON_CDF_2_30))):
        w = F.when(u < F.lit(BOOT_POISSON_CDF_2_30[k]), F.lit(k).cast("long")).otherwise(w)
    return w


def poisson_bootstrap_ci(
    df: DataFrame, id_col: str, value_col: str, n_replicates: int = 40
) -> DataFrame:
    """Deterministic Poisson bootstrap confidence interval for the mean
    of a NON-NEGATIVE integer column (the floored means use truncating
    div — shift negatives upstream or add the pmod adjustment)::

        (n_replicates, mean_lo, mean_hi, mean_all)

    The scale-out bootstrap: resampling-with-replacement is
    irreproducible and needs the row count up front, but for large n the
    multinomial row weights converge to independent Poisson(1) — so each
    row gets, per replicate b, the weight ``F⁻¹_Poisson(u_b)`` where the
    uniforms come from seed-keyed md5 (inverse-CDF against fixed integer
    thresholds — no rand(), same weights every run and in the oracle).
    One digest feeds FOUR replicates (``u_b`` = 8-hex-char lane
    ``b % 4`` of ``md5(id:(b div 4))`` — the digest, not the explode,
    is the CPU bill). Replicate means are floored integer divs; the CI
    is the exact 5th/95th percentile pick (index ``floor(p·B)``) over
    the B-row replicate frame.

    Scale: the explode multiplies the scan by B (the honest cost of a
    B-fold bootstrap) but the shuffle carries only B partial-sum rows —
    per-replicate sums combine map-side. B is a literal; the replicate
    frame is bounded, so its sort is a ≤B-row window.
    """
    n_blocks = (n_replicates + _BOOT_LANES - 1) // _BOOT_LANES
    blk = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_blk")
    hexes = F.md5(
        F.concat(F.col("_id").cast("string"), F.lit(":"), F.col("_blk").cast("string"))
    )

    def lane_w(lane: int) -> "Column":
        h = "_h1" if lane < 2 else "_h2"
        # integer div/mod ONLY — a float division at 2^60 loses bits
        op = (
            f"{h} div {_BOOT_LANE_MOD}"
            if lane % 2 == 0
            else f"pmod({h}, {_BOOT_LANE_MOD})"
        )
        return _boot_weight_expr(F.expr(f"CAST({op} AS BIGINT)"))

    # The 4 lanes fold as PARALLEL aggregates per block (8 map-side
    # sums), so the shuffle carries n_blocks rows of 8 cells — never a
    # per-(row, replicate) frame; the lane explode happens on the
    # bounded n_blocks frame afterwards.
    weighted = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(value_col).cast("long").alias("_v"),
        )
        .select("_id", "_v", blk)
        .withColumn("_hex", hexes)
        .withColumn(
            "_h1", F.conv(F.substring(F.col("_hex"), 1, 15), 16, 10).cast("long")
        )
        .withColumn(
            "_h2", F.conv(F.substring(F.col("_hex"), 17, 15), 16, 10).cast("long")
        )
        .select(  # hoist each lane weight so it is computed ONCE per row
            "_blk",
            "_v",
            *[lane_w(lane).alias(f"_w{lane}") for lane in range(_BOOT_LANES)],
        )
    )
    # r14 optimization (guide §1.2 — don't scan twice): the grand mean
    # used to be a SECOND full pass over ``df``; every block of the
    # exploded frame contains every row exactly once, so folding the
    # plain value sum/count into the same per-block aggregation makes
    # block 0's row carry the grand totals for free (2 extra bigint
    # cells on a <= n_blocks-row shuffle). per_block is localCheckpointed
    # (bounded: n_blocks rows) because two consumers read it — the
    # replicate explode and the grand-mean pick — and without the pin
    # the whole md5 weight pass would run once per consumer.
    per_block = weighted.groupBy("_blk").agg(
        *[
            F.sum(F.col(f"_w{lane}") * F.col("_v")).cast("long").alias(f"_s{lane}")
            for lane in range(_BOOT_LANES)
        ],
        *[
            F.sum(F.col(f"_w{lane}")).cast("long").alias(f"_n{lane}")
            for lane in range(_BOOT_LANES)
        ],
        F.sum("_v").cast("long").alias("_sv"),
        F.count(F.lit(1)).cast("long").alias("_cn"),
    ).localCheckpoint(eager=False)
    lanes = F.array(
        *[
            F.struct(
                (F.col("_blk") * _BOOT_LANES + F.lit(lane)).alias("_b"),
                F.col(f"_s{lane}").alias("_s"),
                F.col(f"_n{lane}").alias("_n"),
            )
            for lane in range(_BOOT_LANES)
        ]
    )
    rep = (
        per_block.select(F.explode(lanes).alias("_bw"))
        .select(
            F.col("_bw._b").alias("_b"),
            F.col("_bw._s").alias("_s"),
            F.col("_bw._n").alias("_n"),
        )
        .filter((F.col("_b") < n_replicates) & (F.col("_n") > 0))
        .withColumn("_mean", F.expr("CAST(_s div _n AS BIGINT)"))
    )
    w = Window.orderBy("_mean", "_b")  # B rows — bounded
    ranked = rep.withColumn("_rk", F.row_number().over(w) - 1).withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy())
    )
    lo_idx = F.expr(f"CAST(_cnt * {BOOT_LO_IDX_PPM} div 1000000 AS BIGINT)")
    hi_idx = F.expr(f"CAST(_cnt * {BOOT_HI_IDX_PPM} div 1000000 AS BIGINT)")
    grand = per_block.filter(F.col("_blk") == 0).select(
        F.expr("CAST(_sv div _cn AS BIGINT)").alias("mean_all")
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    picks = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min(F.when(F.col("_rk") == lo_idx, F.col("_mean"))).cast("long").alias("mean_lo"),
        F.min(F.when(F.col("_rk") == hi_idx, F.col("_mean"))).cast("long").alias("mean_hi"),
    )
    return picks.withColumn("_one", one).join(
        F.broadcast(grand.withColumn("_one", one)), "_one"
    ).select("n_replicates", "mean_lo", "mean_hi", "mean_all")


def poisson_bootstrap_ci_sql(
    table_expr: str, id_expr: str, value_expr: str, n_replicates: int = 40
) -> str:
    """DuckDB rendering of :func:`poisson_bootstrap_ci` — same two
    60-bit hex parses, same div/mod 30-bit lanes, same floored means,
    same percentile index pick."""
    n_blocks = (n_replicates + _BOOT_LANES - 1) // _BOOT_LANES
    lane_u = (
        f"CASE WHEN _lane = 0 THEN _h1 // {_BOOT_LANE_MOD}"
        f" WHEN _lane = 1 THEN _h1 % {_BOOT_LANE_MOD}"
        f" WHEN _lane = 2 THEN _h2 // {_BOOT_LANE_MOD}"
        f" ELSE _h2 % {_BOOT_LANE_MOD} END"
    )
    cases = " ".join(
        f"WHEN _u < {t} THEN {k}"
        for k, t in enumerate(BOOT_POISSON_CDF_2_30)
    )
    return f"""
WITH rep AS (
  SELECT _b,
         CAST(sum(_w * CAST({value_expr} AS BIGINT)) AS BIGINT) AS _s,
         CAST(sum(_w) AS BIGINT) AS _n
  FROM (
    SELECT *, CAST(CASE {cases} ELSE 6 END AS BIGINT) AS _w
    FROM (
      SELECT *, CAST({lane_u} AS BIGINT) AS _u,
             _blk * {_BOOT_LANES} + _lane AS _b
      FROM (
        SELECT t.*, ln._lane,
               CAST('0x' || substring(_hex, 1, 15) AS BIGINT) AS _h1,
               CAST('0x' || substring(_hex, 17, 15) AS BIGINT) AS _h2
        FROM (
          SELECT t0.*, bk0._blk,
                 md5(CAST({id_expr} AS VARCHAR) || ':'
                     || CAST(bk0._blk AS VARCHAR)) AS _hex
          FROM {table_expr} t0,
               unnest(range(0, {n_blocks})) AS bk0(_blk)
        ) t, unnest(range(0, {_BOOT_LANES})) AS ln(_lane)
      )
    )
  )
  WHERE _b < {n_replicates}
  GROUP BY _b HAVING sum(_w) > 0
),
ranked AS (
  SELECT _s // _n AS _mean,
         row_number() OVER (ORDER BY _s // _n, _b) - 1 AS _rk,
         count(*) OVER () AS _cnt
  FROM rep
),
grand AS (
  SELECT CAST(sum(CAST({value_expr} AS BIGINT)) // count(*) AS BIGINT)
           AS mean_all
  FROM {table_expr}
)
SELECT CAST(max(_cnt) AS BIGINT) AS n_replicates,
       CAST(min(CASE WHEN _rk = _cnt * {BOOT_LO_IDX_PPM} // 1000000
                     THEN _mean END) AS BIGINT) AS mean_lo,
       CAST(min(CASE WHEN _rk = _cnt * {BOOT_HI_IDX_PPM} // 1000000
                     THEN _mean END) AS BIGINT) AS mean_hi,
       (SELECT mean_all FROM grand) AS mean_all
FROM ranked
"""


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All pairwise Pearson correlations of integer-valued columns in
    ONE aggregation pass::

        (col_a, col_b, n, corr_6)    -- k·(k−1)/2 rows, a < b

    Spark's built-in ``corr`` is a float accumulator whose partial-merge
    order perturbs low bits; this fold carries exact decimal(38,0)
    moment sums (Σx, Σx², Σxy per pair — same envelope argument as
    :func:`bivariate_stats`) through ONE map-side-combinable aggregate,
    then divides once per pair and rounds to 6 decimals.  The pair
    fan-out happens on the SINGLE result row (a k²-literal projection),
    not on the data — one pass over n rows regardless of k.

    Columns must already be integral (cents/ppm-quantize first).
    """
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(dec(c)).alias(f"_s_{c}"))
        aggs.append(F.sum(dec(c) * dec(c)).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum(dec(a) * dec(b)).alias(f"_sp_{a}_{b}"))
    one = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n = F.col("_n").cast("decimal(38,0)")
            num = (n * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast(
                "double"
            )
            da = (n * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast(
                "double"
            )
            db = (n * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast(
                "double"
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("_n").cast("long").alias("n"),
                    # constant column -> zero variance -> undefined:
                    # explicit NULL (DuckDB double/0 nulls; Spark would
                    # emit NaN/Inf — unified)
                    F.when(
                        (da > 0) & (db > 0),
                        F.round(num / (F.sqrt(da) * F.sqrt(db)), 6),
                    ).alias("corr_6"),
                )
            )
    return one.select(
        F.explode(F.array(*pairs)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "_p.n", "_p.corr_6")


def corr_matrix_sql(table_expr: str, cols: list[str]) -> str:
    """DuckDB rendering of :func:`corr_matrix` — same HUGEINT moment
    sums, one aggregate subquery, one UNION'd pick per pair."""
    sums = ["CAST(count(*) AS HUGEINT) AS n"]
    for c in cols:
        sums.append(f"sum(CAST({c} AS HUGEINT)) AS s_{c}")
        sums.append(f"sum(CAST({c} AS HUGEINT) * CAST({c} AS HUGEINT)) AS ss_{c}")
    picks = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sums.append(
                f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)) AS sp_{a}_{b}"
            )
            picks.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
                f" CAST(n AS BIGINT) AS n,"
                f" CASE WHEN n * ss_{a} - s_{a} * s_{a} > 0"
                f" AND n * ss_{b} - s_{b} * s_{b} > 0 THEN"
                f" round(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
                f" / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
                f" * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))), 6)"
                f" END AS corr_6 FROM m"
            )
    body = "\nUNION ALL\n".join(picks)
    return f"WITH m AS (SELECT {', '.join(sums)} FROM {table_expr})\n{body}"


def zipf_alpha(
    df: DataFrame,
    group_cols: list[str],
    count_col: str,
    head_k: int = 128,
    n_ranges: int = 64,
) -> DataFrame:
    """Zipf exponent per group from a ``(group..., term, count)`` vocab
    frame: OLS slope of ln(count) on ln(rank) over the top ``head_k``
    terms (Zipf's law fits the head; the tail bends and would bias
    alpha)::

        (group..., n_points, alpha_6)

    ``alpha_6 = −slope`` rounded to 6 decimals.  Rank-within-group via
    the range-decomposed :func:`operators.rank.global_rank` over
    ``(group..., −count, term)`` minus a per-group broadcast offset —
    never a per-group sorted window over the vocabulary.  The log
    points quantize to exact micro-units before summation, so the OLS
    moment sums are exact integers and only the final division is
    float.

    ``df`` must have one row per (group, term) with a positive integer
    ``count_col``; the term column must be last in ``df.columns``.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank

    term_col = df.columns[-1]
    keyed = df.select(
        *group_cols,
        F.col(count_col).cast("long").alias("_cnt"),
        (-F.col(count_col).cast("long")).alias("_neg"),
        F.col(term_col).alias("_term"),
    )
    ranked = keyed.transform(
        global_rank([*group_cols, "_neg", "_term"], out_col="_gr", n_ranges=n_ranges)
    )
    base = ranked.groupBy(*group_cols).agg(F.min("_gr").alias("_base"))
    head = (
        ranked.join(F.broadcast(base), group_cols)
        .withColumn("_rk", (F.col("_gr") - F.col("_base") + 1).cast("long"))
        .filter(F.col("_rk") <= head_k)
    )
    x = F.round(F.log(F.col("_rk").cast("double")) * 1_000_000, 0).cast("long")
    y = F.round(F.log(F.col("_cnt").cast("double")) * 1_000_000, 0).cast("long")
    pts = head.select(*group_cols, x.alias("_x"), y.alias("_y"))
    agg = pts.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_x").cast("decimal(38,0)")).alias("_sxx"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_y").cast("decimal(38,0)")).alias("_sxy"),
    )
    n = F.col("n_points").cast("decimal(38,0)")
    num = (n * F.col("_sxy") - F.col("_sx").cast("decimal(38,0)") * F.col("_sy").cast("decimal(38,0)")).cast("double")
    den = (n * F.col("_sxx") - F.col("_sx").cast("decimal(38,0)") * F.col("_sx").cast("decimal(38,0)")).cast("double")
    return agg.select(
        *group_cols,
        "n_points",
        # a 1-point head (or all-equal ranks) has no slope: explicit
        # NULL on both engines
        F.when(den != 0, F.round(-(num / den), 6)).alias("alpha_6"),
    )


def zipf_alpha_sql(
    table_expr: str,
    group_exprs: list[str],
    term_expr: str,
    count_expr: str,
    head_k: int = 128,
) -> str:
    """DuckDB rendering of :func:`zipf_alpha` (per-group row_number —
    the single-node collapse of the grouped range rank)."""
    g = ", ".join(group_exprs)
    return f"""
WITH vocab AS (
  SELECT {g}, {term_expr} AS term, CAST({count_expr} AS BIGINT) AS cnt
  FROM {table_expr}
),
head AS (
  SELECT {g}, cnt,
         row_number() OVER (PARTITION BY {g} ORDER BY -cnt, term) AS rk
  FROM vocab QUALIFY rk <= {head_k}
),
pts AS (
  SELECT {g},
         CAST(round(ln(CAST(rk AS DOUBLE)) * 1000000, 0) AS HUGEINT) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000, 0) AS HUGEINT) AS y
  FROM head
),
m AS (
  SELECT {g}, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM pts GROUP BY {g}
)
SELECT {g}, CAST(n AS BIGINT) AS n_points,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
            round(-(CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)), 6) END AS alpha_6
FROM m
"""


def ucb_arm_scores(
    df: DataFrame, arm_col: str, reward_col: str
) -> DataFrame:
    """UCB1 scores per experiment arm — the explore/exploit monitor for
    any deterministic A/B/n rollout (data-mixture weights, sampler
    variants, labeling strategies)::

        (arm, n, mean_reward_6, bonus_6, ucb_6)

    ``reward_col`` must be an integer reward in [0, scale]; rewards are
    normalized by the GLOBAL max so the exploration bonus
    ``sqrt(2·ln N / n)`` and the exploitation term share the UCB1 unit
    interval.  One grouped pass; the (N, max) anchor is a one-row
    broadcast.  Floats appear only in the final ln/sqrt/divide over
    exact integer sums, rounded to 6 decimals (the bivariate_stats
    discipline).
    """
    arms = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(reward_col).cast("long")).alias("reward_sum"),
        F.max(F.col(reward_col).cast("long")).alias("reward_max"),
    )
    return ucb_from_arm_state(arms)


def ucb_from_arm_state(arms: DataFrame) -> DataFrame:
    """UCB1 from ALREADY-AGGREGATED per-arm counters ``(arm, n,
    reward_sum, reward_max)`` — the mergeable-state form: a streaming
    ``groupBy(arm)`` snapshot (bounded arms-count state; count/sum/max
    are all combiners) or any union of per-shard counters feeds the
    same fold, so the explore/exploit monitor never rereads reward rows
    (the cohens_kappa_from_cm binding, applied to bandits)."""
    tot = arms.agg(
        F.sum("n").cast("long").alias("_big_n"),
        F.max("reward_max").cast("long").alias("_scale"),
    )
    # an all-zero reward column has no UCB1 unit interval: the guard
    # nulls the mean/ucb instead of Spark's NaN (DuckDB double/0 nulls)
    mean_norm = F.when(
        F.col("_scale") > 0,
        F.col("reward_sum").cast("double")
        / (F.col("n").cast("double") * F.col("_scale").cast("double")),
    )
    bonus = F.sqrt(
        F.lit(2.0)
        * F.log(F.col("_big_n").cast("double"))
        / F.col("n").cast("double")
    )
    return (
        arms.join(F.broadcast(tot))
        .select(
            "arm",
            "n",
            F.round(mean_norm, 6).alias("mean_reward_6"),
            F.round(bonus, 6).alias("bonus_6"),
            F.round(mean_norm + bonus, 6).alias("ucb_6"),
        )
    )


def ucb_arm_scores_sql(
    table_expr: str, arm_expr: str, reward_expr: str
) -> str:
    """DuckDB rendering of :func:`ucb_arm_scores`."""
    return f"""
WITH arms AS (
  SELECT {arm_expr} AS arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({reward_expr} AS BIGINT)) AS BIGINT) AS s
  FROM {table_expr} GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM arms),
scale AS (
  SELECT CAST(max(CAST({reward_expr} AS BIGINT)) AS BIGINT) AS mx
  FROM {table_expr}
)
SELECT arm, n,
       CASE WHEN mx > 0 THEN round(CAST(s AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(mx AS DOUBLE)), 6) END
         AS mean_reward_6,
       round(sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
         AS bonus_6,
       CASE WHEN mx > 0 THEN round(CAST(s AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(mx AS DOUBLE))
            + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
         END AS ucb_6
FROM arms, tot, scale
"""


# --- Gini concentration (exact, rank-decomposed) ------------------------------


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    n_ranges: int = 64,
) -> DataFrame:
    """Exact Gini coefficient of a non-negative value per group — the
    concentration/inequality census (how skewed is revenue across
    customers, token mass across sources, traffic across keys)::

        (group..., n, total_value, gini_ppm)

    ``gini = Σ_i (2·r_i + 1 − n)·x_i / (n·Σx)`` with ``r_i`` the 0-based
    within-group rank of ``x_i`` ascending — pure integer arithmetic,
    ``gini_ppm`` exact. Tied values need a unique ``tiebreak_cols``
    order for the rank itself, but the SUM is tie-order invariant
    (equal x ⇒ the block's coefficient sum depends only on the block's
    position), so any tie-break gives the same Gini.

    Degenerate guard: ``n·Σx = 0`` (empty or all-zero group) → NULL on
    both engines. Precondition: values ≥ 0 (standard Gini domain).

    Scale: the rank is :func:`operators.rank.grouped_global_rank`
    (range-repartition + bounded offsets — never a per-group
    single-task sort), then ONE map-side-combinable fold. The rank-sum
    and the final ppm ratio run in decimal(38,0)/HUGEINT (``2n·Σx·10⁶``
    blows through BIGINT at ~10⁷ cents-rows per group — sf0.01 already
    overflowed the first BIGINT draft), which holds ~10³⁸: no practical
    row bound.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import grouped_global_rank

    x = F.col(value_col).cast("long")
    ranked = df.select(
        *[F.col(c) for c in group_cols],
        x.alias("_x"),
        *[F.col(c) for c in tiebreak_cols],
    ).transform(
        grouped_global_rank(
            group_cols, ["_x", *tiebreak_cols], out_col="_r", n_ranges=n_ranges
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").cast("long").alias("total_value"),
        F.sum((dec(F.lit(2) * F.col("_r") + F.lit(1))) * dec(F.col("_x")))
        .alias("_s1"),
    )
    nt = dec(F.col("n")) * dec(F.col("total_value"))
    return agg.select(
        *group_cols,
        "n",
        "total_value",
        F.when(
            nt == F.lit(0).cast("decimal(38,0)"), F.lit(None).cast("long")
        )
        .otherwise(
            F.expr(
                "CAST((_s1 - CAST(n AS DECIMAL(38,0))"
                " * CAST(total_value AS DECIMAL(38,0))) * 1000000"
                " div (CAST(n AS DECIMAL(38,0))"
                " * CAST(total_value AS DECIMAL(38,0))) AS BIGINT)"
            )
        )
        .alias("gini_ppm"),
    )


def gini_concentration_sql(
    table_expr: str,
    group_exprs: list[str],
    value_expr: str,
    tiebreak_exprs: list[str],
) -> str:
    """DuckDB rendering of :func:`gini_concentration` — plain
    partitioned row_number (the oracle side need not scale), same
    integer fold."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    tb = ", ".join(tiebreak_exprs)
    return f"""
WITH ranked AS (
  SELECT {gsel}CAST({value_expr} AS BIGINT) AS x,
         row_number() OVER ({part}ORDER BY CAST({value_expr} AS BIGINT), {tb})
           - 1 AS r
  FROM {table_expr}
),
agg AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS total_value,
         sum((2 * CAST(r AS HUGEINT) + 1) * x) AS s1
  FROM ranked {gby}
)
SELECT {gsel}n, total_value,
       CAST(CASE WHEN n * total_value = 0 THEN NULL
            ELSE (s1 - CAST(n AS HUGEINT) * total_value) * 1000000
                 // (CAST(n AS HUGEINT) * total_value) END
            AS BIGINT) AS gini_ppm
FROM agg
"""


# --- weight-of-evidence / information value feature screen --------------------


def woe_iv_screen(
    df: DataFrame, bucket_col: str, label_col: str
) -> DataFrame:
    """Weight-of-evidence and information-value screen of a bucketed
    feature against a binary label — the classic feature-selection /
    drift primitive (a bucket whose WOE flips sign between refreshes
    is a shifting segment; total IV ranks features)::

        (bucket, n_good, n_bad, woe_micro, iv_micro)

    ``woe = ln((n_good_b/G)/(n_bad_b/B))`` in integer micro-nats,
    ``iv_b = (n_good_b/G − n_bad_b/B)·woe_b`` in integer micro-units —
    each bucket's terms a FIXED sequence of single IEEE ops on exact
    integer counts, rounded per bucket BEFORE any sum (the
    entropy/PMI float discipline). ``label = 1`` is the "bad"/event
    class. Zero-cell buckets (no goods or no bads) have undefined WOE:
    explicit NULL on both engines — the standard screening convention
    (merge or smooth upstream). Total IV = sum of non-NULL iv_micro.

    Scale: one (bucket) count pass + constant-key broadcast of the two
    class totals — map-side combinable, no window.
    """
    lbl = F.col(label_col).cast("long")
    counts = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(F.lit(1) - lbl).cast("long").alias("n_good"),
        F.sum(lbl).cast("long").alias("n_bad"),
    )
    return woe_iv_from_counts(counts)


def woe_iv_from_counts(counts: DataFrame) -> DataFrame:
    """WOE/IV from a per-bucket ``(bucket, n_good, n_bad)`` count grid —
    the MERGEABLE-STATE form of :func:`woe_iv_screen` (which delegates
    here after its groupBy). The grid is plain integer counts on
    deterministic keys: exactly what a streaming groupBy maintains
    (``streaming.streaming_bucket_label_counts``) and what shards merge
    by cell addition — a snapshot through here is bit-identical to the
    batch screen over the same rows (pytest-pinned stream==batch)."""
    counts = counts.withColumn("_one", F.pmod(F.hash(F.lit(1)), F.lit(1)))
    totals = counts.groupBy("_one").agg(
        F.sum("n_good").cast("long").alias("_g"),
        F.sum("n_bad").cast("long").alias("_b"),
    )
    j = counts.join(F.broadcast(totals), "_one")
    dg = F.col("n_good").cast("double") / F.col("_g").cast("double")
    db = F.col("n_bad").cast("double") / F.col("_b").cast("double")
    woe_d = F.log(
        (F.col("n_good").cast("double") * F.col("_b").cast("double"))
        / (F.col("n_bad").cast("double") * F.col("_g").cast("double"))
    )
    defined = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    return j.select(
        "bucket",
        "n_good",
        "n_bad",
        F.when(defined, F.round(woe_d * F.lit(1000000.0)).cast("long"))
        .alias("woe_micro"),
        F.when(defined, F.round((dg - db) * woe_d * F.lit(1000000.0)).cast("long"))
        .alias("iv_micro"),
    )


def woe_iv_screen_sql(
    table_expr: str, bucket_expr: str, label_expr: str
) -> str:
    """DuckDB rendering of :func:`woe_iv_screen` — same fixed IEEE op
    sequence on the same exact counts, same per-bucket rounding."""
    return f"""
WITH counts AS (
  SELECT {bucket_expr} AS bucket,
         CAST(sum(1 - CAST({label_expr} AS BIGINT)) AS BIGINT) AS n_good,
         CAST(sum(CAST({label_expr} AS BIGINT)) AS BIGINT) AS n_bad
  FROM {table_expr} GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS g, CAST(sum(n_bad) AS BIGINT) AS b
  FROM counts
)
SELECT bucket, n_good, n_bad,
       CASE WHEN n_good > 0 AND n_bad > 0 THEN
         CAST(round(ln((CAST(n_good AS DOUBLE) * CAST(b AS DOUBLE))
                       / (CAST(n_bad AS DOUBLE) * CAST(g AS DOUBLE)))
                    * 1000000.0) AS BIGINT) END AS woe_micro,
       CASE WHEN n_good > 0 AND n_bad > 0 THEN
         CAST(round((CAST(n_good AS DOUBLE) / CAST(g AS DOUBLE)
                     - CAST(n_bad AS DOUBLE) / CAST(b AS DOUBLE))
                    * ln((CAST(n_good AS DOUBLE) * CAST(b AS DOUBLE))
                         / (CAST(n_bad AS DOUBLE) * CAST(g AS DOUBLE)))
                    * 1000000.0) AS BIGINT) END AS iv_micro
FROM counts, tot
"""


# --- CUPED variance-reduced experiment readout --------------------------------


def cuped_adjusted_readout(
    df: DataFrame, variant_col: str, x_col: str, y_col: str
) -> DataFrame:
    """CUPED experiment readout (Deng et al., WSDM 2013): per-variant
    metric means adjusted by a pre-experiment covariate, plus the
    variance-reduction factor the covariate buys::

        (variant, n, mean_y_micro, adj_mean_y_micro, rho2_ppm)

    ``θ = cov(X, Y)/var(X)`` pooled over ALL rows (the standard shared-θ
    form — per-variant θ re-introduces bias), and per variant
    ``adj_mean = ȳ_v − θ·(x̄_v − x̄)``. ``rho2_ppm`` is the pooled
    squared correlation = the fraction of metric variance CUPED removes
    (same value on every output row). Integer inputs (cents/counts);
    moment sums exact decimal(38,0)/HUGEINT; the closed forms are a
    FIXED sequence of IEEE ops on those exact integers (the
    bivariate_stats discipline), means reported in rounded micro-units.

    Degenerate guard: ``var(X) = 0`` → θ undefined → adjusted mean
    falls back to the raw mean and ``rho2_ppm`` is NULL, both engines.

    Scale: ONE map-side-combinable global moment pass + one per-variant
    pass — no window, no join wider than the variant frame.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    glob = (
        df.agg(
            F.count(F.lit(1)).cast("long").alias("_gn"),
            F.sum(x).alias("_gsx"),
            F.sum(y).alias("_gsy"),
            F.sum(dec(x) * dec(x)).alias("_gsxx"),
            F.sum(dec(x) * dec(y)).alias("_gsxy"),
            F.sum(dec(y) * dec(y)).alias("_gsyy"),
        )
        .withColumn("_one", one)
    )
    per = (
        df.groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(x).cast("long").alias("_sx"),
            F.sum(y).cast("long").alias("_sy"),
        )
        .withColumn("_one", one)
    )
    j = per.join(F.broadcast(glob), "_one")
    gn = dec(F.col("_gn"))
    varx_num = (gn * F.col("_gsxx") - dec(F.col("_gsx")) * dec(F.col("_gsx"))).cast("double")
    vary_num = (gn * F.col("_gsyy") - dec(F.col("_gsy")) * dec(F.col("_gsy"))).cast("double")
    cov_num = (gn * F.col("_gsxy") - dec(F.col("_gsx")) * dec(F.col("_gsy"))).cast("double")
    theta = cov_num / varx_num  # same n-scaling cancels
    mean_y = F.col("_sy").cast("double") / F.col("n").cast("double")
    mean_x = F.col("_sx").cast("double") / F.col("n").cast("double")
    gmean_x = F.col("_gsx").cast("double") / F.col("_gn").cast("double")
    adj = mean_y - theta * (mean_x - gmean_x)
    degenerate = varx_num == F.lit(0.0)
    rho2 = (cov_num * cov_num) / (varx_num * vary_num)
    return j.select(
        "variant",
        "n",
        F.round(mean_y * F.lit(1000000.0)).cast("long").alias("mean_y_micro"),
        F.when(degenerate, F.round(mean_y * F.lit(1000000.0)).cast("long"))
        .otherwise(F.round(adj * F.lit(1000000.0)).cast("long"))
        .alias("adj_mean_y_micro"),
        F.when(~degenerate & (vary_num > 0), F.round(rho2 * F.lit(1000000.0)).cast("long"))
        .alias("rho2_ppm"),
    )


def cuped_adjusted_readout_sql(
    table_expr: str, variant_expr: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB rendering of :func:`cuped_adjusted_readout` — HUGEINT
    moments, same fixed IEEE sequence."""
    return f"""
WITH src AS (
  SELECT {variant_expr} AS variant,
         CAST({x_expr} AS BIGINT) AS x, CAST({y_expr} AS BIGINT) AS y
  FROM {table_expr}
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS gn,
         CAST(sum(x) AS HUGEINT) AS gsx, CAST(sum(y) AS HUGEINT) AS gsy,
         sum(CAST(x AS HUGEINT) * x) AS gsxx,
         sum(CAST(x AS HUGEINT) * y) AS gsxy,
         sum(CAST(y AS HUGEINT) * y) AS gsyy
  FROM src
),
per AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
  FROM src GROUP BY 1
),
forms AS (
  SELECT variant, n, sx, sy, gn, gsx,
         CAST(CAST(gn AS HUGEINT) * gsxx - gsx * gsx AS DOUBLE) AS varx_num,
         CAST(CAST(gn AS HUGEINT) * gsyy - gsy * gsy AS DOUBLE) AS vary_num,
         CAST(CAST(gn AS HUGEINT) * gsxy - gsx * gsy AS DOUBLE) AS cov_num
  FROM per, gstats
)
SELECT variant, n,
       CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
            AS BIGINT) AS mean_y_micro,
       CAST(round(CASE WHEN varx_num = 0
            THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
            ELSE CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - (cov_num / varx_num)
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                      - CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)) END
            * 1000000.0) AS BIGINT) AS adj_mean_y_micro,
       CASE WHEN varx_num <> 0 AND vary_num > 0 THEN
         CAST(round((cov_num * cov_num) / (varx_num * vary_num) * 1000000.0)
              AS BIGINT) END AS rho2_ppm
FROM forms
"""


# --- Theil-Sen robust trend ---------------------------------------------------


def theil_sen_trend(
    df: DataFrame,
    group_cols: list[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per group: the LOWER MEDIAN of all
    pairwise slopes of an already-aggregated series — the
    outlier-immune alternative to the OLS slope (one corrupt day moves
    OLS, not the median slope)::

        (group..., n_points, n_pairs, slope_ppm)

    ``slope_ppm = (y_j − y_i)·10⁶ div (t_j − t_i)`` per pair — exact
    integers (both engines truncate integer division toward zero, so
    negative slopes agree); the median is the LOWER median (the
    rank-⌈c/2⌉ pair under (slope, t_i, t_j) order), never an
    interpolated midpoint — engine-identical by construction.

    Intended for BOUNDED series frames (a daily/weekly rollup — the
    caller owns the pre-aggregation, same contract as ``acf_lags``):
    the pair join is C(days, 2) per group on the ROLLUP, never the raw
    events, and the per-group rank window runs over that bounded pair
    frame. Groups with < 2 points emit no row.
    """
    base = df.select(
        *[F.col(c) for c in group_cols],
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    ).withColumn(
        # bounded: one count per group over the ROLLUP frame
        "_np", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    a, b = base.alias("_a"), base.alias("_b")
    cond = F.col("_a._t") < F.col("_b._t")
    for g in group_cols:
        cond = F.col(f"_a.{g}").eqNullSafe(F.col(f"_b.{g}")) & cond
    pairs = a.join(b, cond).select(
        *[F.col(f"_a.{g}") for g in group_cols],
        F.col("_a._np").alias("_npts"),
        F.col("_a._t").alias("_t1"),
        F.col("_b._t").alias("_t2"),
        F.expr(
            "CAST((_b._v - _a._v) * 1000000 div (_b._t - _a._t) AS BIGINT)"
        ).alias("_slope"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_slope", "_t1", "_t2")
    ranked = pairs.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    return ranked.filter(
        F.col("_rn") == F.expr("(_cnt + 1) div 2")
    ).select(
        *group_cols,
        F.col("_npts").cast("long").alias("n_points"),
        F.col("_cnt").cast("long").alias("n_pairs"),
        F.col("_slope").alias("slope_ppm"),
    )


def theil_sen_trend_sql(
    table_expr: str,
    group_exprs: list[str],
    t_expr: str,
    value_expr: str,
) -> str:
    """DuckDB rendering of :func:`theil_sen_trend` — same pair frame,
    same lower-median pick."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    part_win = f"({part.strip()})" if g else "()"
    on_g = " AND ".join(
        f"a.{e} IS NOT DISTINCT FROM b.{e}" for e in group_exprs
    )
    on_clause = f"{on_g} AND " if on_g else ""
    ga = ", ".join(f"a.{e} AS {e}" for e in group_exprs)
    gasel = f"{ga}, " if ga else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({t_expr} AS BIGINT) AS t, CAST({value_expr} AS BIGINT) AS v,
         count(*) OVER {part_win} AS np
  FROM {table_expr}
),
pairs AS (
  SELECT {gasel}a.np AS npts, a.t AS t1, b.t AS t2,
         CAST((b.v - a.v) * 1000000 // (b.t - a.t) AS BIGINT) AS slope
  FROM base a JOIN base b ON {on_clause}a.t < b.t
),
ranked AS (
  SELECT *, row_number() OVER ({part}ORDER BY slope, t1, t2) AS rn,
         count(*) OVER {part_win} AS cnt
  FROM pairs
)
SELECT {gsel}CAST(npts AS BIGINT) AS n_points,
       CAST(cnt AS BIGINT) AS n_pairs,
       slope AS slope_ppm
FROM ranked WHERE rn = (cnt + 1) // 2
"""


# --- sample-ratio-mismatch (SRM) goodness-of-fit check ------------------------


def srm_check(
    df: DataFrame,
    experiment_col: str,
    variant_col: str,
    threshold_micro: int,
) -> DataFrame:
    """Sample-ratio-mismatch check per experiment — the first gate every
    A/B readout must pass (a randomizer bug shows up as assignment
    counts drifting from the designed EQUAL split long before any
    metric moves)::

        (experiment, n, n_variants, chi2_micro, srm_flag)

    Goodness-of-fit chi² against the equal k-way split over the
    OBSERVED variants, kept exact until one final integer division:
    ``chi2 = Σ(obs·k − n)² / (k·n)`` (algebraically equal to
    ``Σ(obs − n/k)²/(n/k)``), numerator summed in decimal(38,0),
    ``chi2_micro`` the truncated micro-units quotient — identical on
    both engines with no per-term float. ``srm_flag = chi2_micro >
    threshold_micro`` (pass the chi² critical value for k−1 df at your
    alpha; 0.001 is the industry SRM convention). A DESIGNED arm with
    ZERO assignments is invisible to the observed-variant split —
    detecting it needs the design table joined upstream (documented
    limitation, standard for this check).

    Scale: one (experiment, variant) count + one per-experiment fold —
    both map-side combinable; single-variant experiments emit chi2 0
    (nothing to mismatch against itself).
    """
    counts = df.groupBy(
        F.col(experiment_col).alias("experiment"),
        F.col(variant_col).alias("variant"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    return srm_from_counts(counts, threshold_micro)


def srm_from_counts(counts: DataFrame, threshold_micro: int) -> DataFrame:
    """SRM check from an ``(experiment, variant, n_obs)`` count grid —
    the MERGEABLE-STATE form of :func:`srm_check` (which delegates here
    after its groupBy). The grid is exactly what a streaming
    per-assignment counter maintains
    (``streaming.streaming_assignment_counts``) and what shards merge
    by cell addition — so the randomizer health gate runs LIVE from
    counters alone, no assignment-log re-read (pytest-pinned
    stream==batch, the WOE/IV / isotonic / stump / transition-entropy
    precedent)."""
    # explicit column projection so the grid may be a shared view (the
    # streaming memory-sink snapshot) without self-join attribute clashes
    cells = counts.select(
        F.col("experiment").alias("_e"),
        F.col("n_obs").cast("long").alias("_obs"),
    )
    per = cells.groupBy(F.col("_e").alias("experiment")).agg(
        F.sum("_obs").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_variants"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dev = dec(F.col("_obs") * F.col("n_variants") - F.col("n"))
    num = (
        cells.alias("c")
        .join(  # same key — AQE reuses the layout; explicit aliases keep
            # the self-join lineage robust to future column additions
            per.alias("p"), F.col("c._e") == F.col("p.experiment")
        )
        .groupBy("experiment", "n", "n_variants")
        .agg(F.sum(dev * dev).alias("_sq"))
    )
    return num.select(
        "experiment",
        "n",
        "n_variants",
        F.expr(
            "CAST(_sq * 1000000 div (CAST(n_variants AS DECIMAL(38,0))"
            " * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("chi2_micro"),
    ).withColumn(
        "srm_flag",
        (F.col("chi2_micro") > F.lit(int(threshold_micro))).cast("int"),
    )


def srm_check_sql(
    table_expr: str,
    experiment_expr: str,
    variant_expr: str,
    threshold_micro: int,
) -> str:
    """DuckDB rendering of :func:`srm_check` — same exact-integer
    numerator, same single truncated division."""
    return f"""
WITH counts AS (
  SELECT {experiment_expr} AS experiment, {variant_expr} AS v,
         CAST(count(*) AS BIGINT) AS obs
  FROM {table_expr} GROUP BY 1, 2
),
per AS (
  SELECT experiment, CAST(sum(obs) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k
  FROM counts GROUP BY 1
),
num AS (
  SELECT c.experiment,
         sum(CAST(c.obs * p.k - p.n AS HUGEINT)
             * CAST(c.obs * p.k - p.n AS HUGEINT)) AS sq
  FROM counts c JOIN per p USING (experiment)
  GROUP BY 1
)
SELECT p.experiment, p.n, p.k AS n_variants,
       CAST(num.sq * 1000000 // (CAST(p.k AS HUGEINT) * p.n) AS BIGINT)
         AS chi2_micro,
       CAST(CAST(num.sq * 1000000 // (CAST(p.k AS HUGEINT) * p.n) AS BIGINT)
            > {int(threshold_micro)} AS INT) AS srm_flag
FROM per p JOIN num USING (experiment)
"""


# --- leave-one-group-out influence (data valuation) ---------------------------


def loo_group_influence(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Leave-one-group-out influence of every group on the global mean —
    the cheap exact member of the data-valuation family (Shapley's
    one-coalition cousin): which source/segment, if dropped, moves the
    corpus metric most, computed in ONE pass from the closed form
    instead of |groups| re-runs::

        (group..., n_g, sum_g, mean_all_micro, mean_without_micro,
         influence_micro)

    ``mean_without = (S − S_g)/(N − n_g)`` and ``influence =
    mean_without − mean_all`` (positive = the group DRAGS the metric
    down; dropping it raises the mean). All three means are truncated
    integer micro-units from decimal(38,0)/HUGEINT products — exact and
    engine-identical, no float. A group that IS the whole input has no
    leave-out complement: explicit NULLs.

    Scale: one grouped sum + a constant-key broadcast of the global
    totals — map-side combinable, no window, no second scan.
    """
    x = F.col(value_col).cast("long")
    gcols = [F.col(c) for c in group_cols]
    per = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(x).cast("long").alias("sum_g"),
    )
    return loo_from_counts(per, group_cols)


def loo_from_counts(per: DataFrame, group_cols: list[str]) -> DataFrame:
    """LOO influence from ALREADY-AGGREGATED per-group ``(n_g, sum_g)``
    counters — the MERGEABLE-STATE form of :func:`loo_group_influence`
    (which delegates here after its one grouped pass). The counters are
    exactly what ``streaming.streaming_group_sums`` maintains and what
    shards merge by cell addition; the global totals FOLD FROM THE
    STATE (one tiny agg over O(groups) rows), so the live data-
    valuation readout needs no second pass over the rows
    (pytest-pinned stream==batch)."""
    gcols = [F.col(c) for c in group_cols]
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    tot = per.agg(
        F.sum("n_g").cast("long").alias("_n"),
        F.sum("sum_g").cast("long").alias("_s"),
    ).withColumn("_one", one)
    j = per.withColumn("_one", one).join(F.broadcast(tot), "_one")
    dec = "DECIMAL(38,0)"
    mean_all = F.expr(
        f"CAST(CAST(_s AS {dec}) * 1000000 div CAST(_n AS {dec}) AS BIGINT)"
    )
    mean_wo = F.expr(
        f"CAST(CASE WHEN _n = n_g THEN NULL"
        f" ELSE CAST(_s - sum_g AS {dec}) * 1000000"
        f" div CAST(_n - n_g AS {dec}) END AS BIGINT)"
    )
    return j.select(
        *gcols,
        "n_g",
        "sum_g",
        mean_all.alias("mean_all_micro"),
        mean_wo.alias("mean_without_micro"),
        (mean_wo - mean_all).cast("long").alias("influence_micro"),
    )


def loo_group_influence_sql(
    table_expr: str, group_exprs: list[str], value_expr: str
) -> str:
    """DuckDB rendering of :func:`loo_group_influence` — same HUGEINT
    products, same truncated micro means."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    return f"""
WITH per AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST({value_expr} AS BIGINT)) AS BIGINT) AS sum_g
  FROM {table_expr} {gby}
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({value_expr} AS BIGINT)) AS BIGINT) AS s
  FROM {table_expr}
)
SELECT {gsel}n_g, sum_g,
       CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_all_micro,
       CAST(CASE WHEN n = n_g THEN NULL
            ELSE CAST(s - sum_g AS HUGEINT) * 1000000 // (n - n_g) END
            AS BIGINT) AS mean_without_micro,
       CAST(CASE WHEN n = n_g THEN NULL
            ELSE CAST(s - sum_g AS HUGEINT) * 1000000 // (n - n_g)
                 - CAST(s AS HUGEINT) * 1000000 // n END
            AS BIGINT) AS influence_micro
FROM per, tot
"""


# --- standardized mean difference (covariate balance) --------------------------


def smd_balance_check(
    df: DataFrame,
    arm_col: str,
    covariate_cols: list[str],
    flag_threshold_micro: int = 100_000,
) -> DataFrame:
    """Covariate balance between two arms as the standardized mean
    difference — the diagnostic every observational comparison (and
    every A/B sanity pass) runs before trusting an effect estimate::

        (covariate, arm_a, arm_b, n_a, n_b, smd_micro, imbalance_flag)

    ``SMD = (x̄_a − x̄_b)/√((s²_a + s²_b)/2)`` per covariate, the usual
    |SMD| > 0.1 rule as the flag (threshold in micro-units). Arms pair
    off as ``arm_a < arm_b`` (two arms → one row per covariate; k arms
    → every pair, the standard multi-arm balance table), so sign is
    deterministic. Moments are exact decimal(38,0)/HUGEINT sums; the
    closed form is a FIXED IEEE op sequence rounded to micro per
    covariate (the bivariate_stats discipline). Zero pooled variance →
    NULL SMD, flag 0 (identical constants are balanced).

    Scale: covariates melt into ONE (covariate, arm) grouped moment
    pass — map-side combinable, row count independent of the covariate
    count in the shuffle.
    """
    melted = df.select(
        F.col(arm_col).cast("string").alias("_arm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_cov"),
                        F.col(c).cast("long").alias("_x"),
                    )
                    for c in covariate_cols
                ]
            )
        ).alias("_cx"),
    ).select("_arm", F.col("_cx._cov").alias("_cov"), F.col("_cx._x").alias("_x"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = melted.groupBy("_cov", "_arm").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum(dec(F.col("_x")) * dec(F.col("_x"))).alias("_sxx"),
    )
    return smd_from_moments(m, flag_threshold_micro)


def smd_from_moments(
    m: DataFrame, flag_threshold_micro: int = 100_000
) -> DataFrame:
    """SMD balance table from an ALREADY-AGGREGATED per-(covariate, arm)
    exact-moment grid ``(_cov, _arm, _n, _sx, _sxx)`` — the
    MERGEABLE-STATE form of :func:`smd_balance_check` (which delegates
    here after its one melted moment pass). The grid is exactly what
    ``streaming.streaming_arm_covariate_moments`` maintains and what
    shards merge by cell addition of the three moments, so the balance
    diagnostic updates DURING enrollment with no exposure-log re-read
    (pytest-pinned stream==batch). Everything here runs on the bounded
    covariates x arms frame."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # the b side renames EVERY column: identity self-joins over a
    # memory-sink/table-backed grid (the streaming snapshot path) defeat
    # DataFrame-alias disambiguation, but fresh exprIds from a full
    # rename project never conflict
    a = m.select(
        F.col("_cov").alias("_cov_a"),
        F.col("_arm").alias("_arm_a"),
        F.col("_n").alias("_n_a"),
        F.col("_sx").alias("_sx_a"),
        F.col("_sxx").alias("_sxx_a"),
    )
    b = m.select(
        F.col("_cov").alias("_cov_b"),
        F.col("_arm").alias("_arm_b"),
        F.col("_n").alias("_n_b"),
        F.col("_sx").alias("_sx_b"),
        F.col("_sxx").alias("_sxx_b"),
    )
    j = a.join(
        b,
        (F.col("_cov_a") == F.col("_cov_b"))
        & (F.col("_arm_a") < F.col("_arm_b")),
    )
    # sample variance via the exact moment form: (n·Σx² − (Σx)²)/(n·(n−1))
    def var_num(side: str):
        return (
            dec(F.col(f"_n_{side}")) * F.col(f"_sxx_{side}")
            - dec(F.col(f"_sx_{side}")) * dec(F.col(f"_sx_{side}"))
        ).cast("double") / (
            F.col(f"_n_{side}").cast("double")
            * (F.col(f"_n_{side}") - F.lit(1)).cast("double")
        )

    mean = lambda side: (  # noqa: E731
        F.col(f"_sx_{side}").cast("double") / F.col(f"_n_{side}").cast("double")
    )
    pooled = F.sqrt((var_num("a") + var_num("b")) / F.lit(2.0))
    smd = F.round((mean("a") - mean("b")) / pooled * F.lit(1000000.0)).cast("long")
    out = j.select(
        F.col("_cov_a").alias("covariate"),
        F.col("_arm_a").alias("arm_a"),
        F.col("_arm_b").alias("arm_b"),
        F.col("_n_a").alias("n_a"),
        F.col("_n_b").alias("n_b"),
        F.when(pooled > 0, smd).alias("smd_micro"),
    ).withColumn(
        "imbalance_flag",
        F.when(
            F.abs(F.coalesce(F.col("smd_micro"), F.lit(0)))
            > F.lit(int(flag_threshold_micro)),
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return out


def smd_balance_check_sql(
    table_expr: str,
    arm_expr: str,
    covariate_exprs: list[str],
    flag_threshold_micro: int = 100_000,
) -> str:
    """DuckDB rendering of :func:`smd_balance_check` — same melt, same
    HUGEINT moments, same fixed IEEE sequence."""
    arms = " UNION ALL ".join(
        f"SELECT CAST({arm_expr} AS VARCHAR) AS arm, '{c}' AS cov,"
        f" CAST({c} AS BIGINT) AS x FROM {table_expr}"
        for c in covariate_exprs
    )
    return f"""
WITH melted AS ({arms}),
m AS (
  SELECT cov, arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM melted GROUP BY 1, 2
),
j AS (
  SELECT a.cov, a.arm AS arm_a, b.arm AS arm_b,
         a.n AS n_a, b.n AS n_b,
         CAST(CAST(a.n AS HUGEINT) * a.sxx - CAST(a.sx AS HUGEINT) * a.sx
              AS DOUBLE) / (CAST(a.n AS DOUBLE) * (a.n - 1)) AS var_a,
         CAST(CAST(b.n AS HUGEINT) * b.sxx - CAST(b.sx AS HUGEINT) * b.sx
              AS DOUBLE) / (CAST(b.n AS DOUBLE) * (b.n - 1)) AS var_b,
         CAST(a.sx AS DOUBLE) / a.n AS mean_a,
         CAST(b.sx AS DOUBLE) / b.n AS mean_b
  FROM m a JOIN m b ON a.cov = b.cov AND a.arm < b.arm
)
SELECT cov AS covariate, arm_a, arm_b, n_a, n_b,
       CASE WHEN sqrt((var_a + var_b) / 2.0) > 0 THEN
         CAST(round((mean_a - mean_b) / sqrt((var_a + var_b) / 2.0)
                    * 1000000.0) AS BIGINT) END AS smd_micro,
       CAST(CASE WHEN abs(coalesce(
              CASE WHEN sqrt((var_a + var_b) / 2.0) > 0 THEN
                CAST(round((mean_a - mean_b) / sqrt((var_a + var_b) / 2.0)
                           * 1000000.0) AS BIGINT) END, 0))
            > {int(flag_threshold_micro)} THEN 1 ELSE 0 END AS INT)
         AS imbalance_flag
FROM j
"""


def transition_entropy(
    df: DataFrame, group_cols: list[str], src_col: str, dst_col: str
) -> DataFrame:
    """Conditional next-state entropy of an observed transition stream
    per group — "how predictable is the next event given the current
    one" (the first-order Markov predictability readout; 0 = fully
    deterministic flows, ln(k) = next step independent of the current
    state)::

        (group..., n_transitions, n_src_states,
         cond_entropy_micro, marginal_entropy_micro)

    ``cond = H(dst|src) = Σ_{s,t} −(n_st/N)·ln(n_st/n_s)`` and
    ``marginal = H(dst)`` — their difference is the information the
    current state carries about the next (the MI form of the sequence).
    Each term is a FIXED sequence of single IEEE ops on exact integer
    counts, rounded to micro-nats BEFORE the sum (the
    categorical_entropy float discipline). Rows with NULL ``src`` or
    ``dst`` are excluded (sequence heads/tails — the caller's lag
    window emits them as NULL); group keys may be NULL (null-safe
    joins, the ADVICE-r8 convention).

    Scale: one (group, src, dst) count pass, then every further fold
    and join runs on the count grid (bounded by the state-pair domain),
    never the raw stream. Map-side combinable throughout; no window.
    """
    if not group_cols:
        # the grid joins key on the group tuple; an empty tuple would be
        # a constant-key join of DATA-sized frames (a plan-sweep
        # violation) — band the stream upstream instead
        raise ValueError("transition_entropy requires >=1 group column")
    rows = df.where(
        F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    ).select(
        *[F.col(c) for c in group_cols],
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_t"),
    )
    st = rows.groupBy(*group_cols, "_s", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("_n_st")
    )
    return transition_entropy_from_counts(st, group_cols)


def transition_entropy_from_counts(
    st: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Entropies from a ``(group..., _s, _t, _n_st)`` transition count
    grid — the MERGEABLE-STATE form of :func:`transition_entropy`
    (which delegates here after its groupBy). The grid is plain integer
    counts on deterministic keys: exactly what a streaming groupBy
    maintains (``streaming.streaming_transition_counts``) and what
    shards merge by cell addition — a snapshot through here is
    bit-identical to the batch readout over the same transitions
    (pytest-pinned stream==batch)."""
    st = st.localCheckpoint(eager=False)  # feeds three derived grids
    s = st.groupBy(*group_cols, "_s").agg(
        F.sum("_n_st").cast("long").alias("_n_s")
    )
    t = st.groupBy(*group_cols, "_t").agg(
        F.sum("_n_st").cast("long").alias("_n_t")
    )
    tot = st.groupBy(*group_cols).agg(
        F.sum("_n_st").cast("long").alias("_n"),
        F.count_distinct(F.col("_s")).cast("long").alias("n_src_states"),
    )

    def _gjoin(left, right, extra: list[str]):
        la, ra = left.alias("_l"), right.alias("_r")
        cond = None
        for g in group_cols:
            eq = F.col(f"_l.{g}").eqNullSafe(F.col(f"_r.{g}"))
            cond = eq if cond is None else (cond & eq)
        for e in extra:
            eq = F.col(f"_l.{e}") == F.col(f"_r.{e}")
            cond = eq if cond is None else (cond & eq)
        keep = [F.col(f"_l.{c}") for c in left.columns] + [
            F.col(f"_r.{c}")
            for c in right.columns
            if c not in left.columns
        ]
        return la.join(ra, cond).select(*keep)

    grid = _gjoin(_gjoin(st, s, ["_s"]), tot, [])
    p_n = F.col("_n_st").cast("double") / F.col("_n").cast("double")
    cterm = F.round(
        -(p_n * F.log(F.col("_n_st").cast("double") / F.col("_n_s").cast("double")))
        * F.lit(1000000.0)
    ).cast("long")
    cond_h = grid.withColumn("_term", cterm).groupBy(*group_cols).agg(
        F.max("_n").alias("n_transitions"),
        F.max("n_src_states").alias("n_src_states"),
        F.sum("_term").cast("long").alias("cond_entropy_micro"),
    )
    mgrid = _gjoin(t, tot, [])
    q = F.col("_n_t").cast("double") / F.col("_n").cast("double")
    mterm = F.round(-(q * F.log(q)) * F.lit(1000000.0)).cast("long")
    marg_h = mgrid.withColumn("_mterm", mterm).groupBy(*group_cols).agg(
        F.sum("_mterm").cast("long").alias("marginal_entropy_micro")
    )
    return _gjoin(cond_h, marg_h, [])


def transition_entropy_sql(
    table_expr: str, group_exprs: list[str], src_expr: str, dst_expr: str
) -> str:
    """DuckDB rendering of :func:`transition_entropy` — same count
    grids, same per-term micro-nat rounding, null-safe group joins."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    gpre = lambda a: (", ".join(f"{a}.{c}" for c in group_exprs) + ", ") if g else ""  # noqa: E731,E501
    on = lambda a, b: (  # noqa: E731
        " AND ".join(f"{a}.{c} IS NOT DISTINCT FROM {b}.{c}" for c in group_exprs)
        or "TRUE"
    )
    return f"""
WITH rows_f AS (
  SELECT {gsel}{src_expr} AS s, {dst_expr} AS t
  FROM {table_expr}
  WHERE {src_expr} IS NOT NULL AND {dst_expr} IS NOT NULL
),
st AS (
  SELECT {gsel}s, t, CAST(count(*) AS BIGINT) AS n_st
  FROM rows_f GROUP BY {gsel}s, t
),
sc AS (
  SELECT {gsel}s, CAST(sum(n_st) AS BIGINT) AS n_s
  FROM st GROUP BY {gsel}s
),
tc AS (
  SELECT {gsel}t, CAST(sum(n_st) AS BIGINT) AS n_t
  FROM st GROUP BY {gsel}t
),
tot AS (
  SELECT {gsel}CAST(sum(n_st) AS BIGINT) AS n,
         CAST(count(DISTINCT s) AS BIGINT) AS n_src_states
  FROM st {("GROUP BY " + g) if g else ""}
),
cond_h AS (
  SELECT {gpre("st")}max(tot.n) AS n_transitions,
         max(tot.n_src_states) AS n_src_states,
         CAST(sum(CAST(round(-(CAST(st.n_st AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(st.n_st AS DOUBLE) / CAST(sc.n_s AS DOUBLE))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS cond_entropy_micro
  FROM st
  JOIN sc ON {on("st", "sc")} AND st.s = sc.s
  JOIN tot ON {on("st", "tot")}
  {("GROUP BY " + ", ".join(f"st.{c}" for c in group_exprs)) if g else ""}
),
marg_h AS (
  SELECT {gpre("tc")}CAST(sum(CAST(round(
           -(CAST(tc.n_t AS DOUBLE) / CAST(tot.n AS DOUBLE))
           * ln(CAST(tc.n_t AS DOUBLE) / CAST(tot.n AS DOUBLE))
           * 1000000.0) AS BIGINT)) AS BIGINT) AS marginal_entropy_micro
  FROM tc JOIN tot ON {on("tc", "tot")}
  {("GROUP BY " + ", ".join(f"tc.{c}" for c in group_exprs)) if g else ""}
)
SELECT * FROM (
  SELECT {gpre("cond_h")}cond_h.n_transitions, cond_h.n_src_states,
         cond_h.cond_entropy_micro, marg_h.marginal_entropy_micro
  FROM cond_h JOIN marg_h ON {on("cond_h", "marg_h")}
) _te_out
"""


def stratified_ate(
    df: DataFrame, bin_col: str, treat_col: str, y_col: str
) -> DataFrame:
    """Stratified average-treatment-effect readout over observational
    data — subclassification on a binned confounder (Cochran 1968;
    the bin-propensity special case of IPW): within each stratum the
    treated/control means difference, overall the stratum-size-weighted
    average over COMMON-SUPPORT strata only::

        (bin, n_treated, n_control, diff_micro, supported,
         n_supported_units, ate_micro)

    ``y`` folds to cents; per-bin means are single IEEE divisions on
    exact integer sums, ``diff_micro`` (micro-currency) rounds per bin
    BEFORE the overall fold, and ``ate_micro = Σ(diff_micro·n_bin) div
    N_supported`` is pure integer arithmetic after that (the Theil-Sen
    `div` convention — both engines truncate toward zero). A stratum
    missing either arm (``supported = 0``) is EXCLUDED from the ATE and
    reported — off-support strata are the analyst's overlap warning,
    not silently imputable. All-unsupported data → NULL ate. The
    ``ate_micro``/``n_supported_units`` columns repeat on every row
    (the density_ratio_weights convention: per-bin diagnostics + the
    one-number readout in a single frame).

    Scale: ONE (bin) grouped pass over the rows + a bounded-bin fold +
    constant-key broadcast back. No window, no join wider than the bin
    frame.
    """
    t = F.col(treat_col).cast("long")
    y = F.round(F.col(y_col).cast("double") * F.lit(100.0)).cast("long")
    per = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(t).cast("long").alias("n_treated"),
        F.sum(F.lit(1) - t).cast("long").alias("n_control"),
        F.sum(t * y).cast("long").alias("_s1"),
        F.sum((F.lit(1) - t) * y).cast("long").alias("_s0"),
    )
    return stratified_ate_from_counts(per)


def stratified_ate_from_counts(per: DataFrame) -> DataFrame:
    """Stratified ATE from an ALREADY-AGGREGATED per-stratum grid
    ``(bin, n_treated, n_control, _s1, _s0)`` (arm counts + exact cents
    outcome sums per arm) — the MERGEABLE-STATE form of
    :func:`stratified_ate` (which delegates here after its one grouped
    pass). The grid is exactly what
    ``streaming.streaming_strata_outcome_sums`` maintains and what
    shards merge by cell addition, so the subclassification effect
    estimate — including the common-support exclusions — updates live
    during an observational rollout (pytest-pinned stream==batch).
    Everything here runs on the bounded strata frame."""
    supported = (F.col("n_treated") > 0) & (F.col("n_control") > 0)
    diff = F.when(
        supported,
        F.round(
            (
                F.col("_s1").cast("double") / F.col("n_treated").cast("double")
                - F.col("_s0").cast("double") / F.col("n_control").cast("double")
            )
            * F.lit(10000.0)  # cents -> micro-currency
        ).cast("long"),
    )
    binned = per.select(
        "bin",
        "n_treated",
        "n_control",
        diff.alias("diff_micro"),
        supported.cast("int").alias("supported"),
    )
    glob = binned.agg(
        F.sum(
            F.when(
                F.col("supported") == 1,
                (F.col("n_treated") + F.col("n_control")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_supported_units"),
        F.sum(
            F.when(
                F.col("supported") == 1,
                F.col("diff_micro")
                * (F.col("n_treated") + F.col("n_control")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("_num"),
    ).select(
        F.lit(0).alias("_k"),
        "n_supported_units",
        F.when(
            F.col("n_supported_units") > 0,
            F.expr("_num div n_supported_units"),
        ).alias("ate_micro"),
    )
    return (
        binned.withColumn("_k", F.lit(0))
        .join(F.broadcast(glob), "_k")
        .select(
            "bin",
            "n_treated",
            "n_control",
            "diff_micro",
            "supported",
            "n_supported_units",
            "ate_micro",
        )
    )


def stratified_ate_sql(
    table_expr: str, bin_expr: str, treat_expr: str, y_expr: str
) -> str:
    """DuckDB rendering of :func:`stratified_ate` — same per-bin
    rounded diffs, same integer weighted fold and `//` readout."""
    return f"""
WITH per AS (
  SELECT {bin_expr} AS bin,
         CAST(sum(CAST({treat_expr} AS BIGINT)) AS BIGINT) AS n_treated,
         CAST(sum(1 - CAST({treat_expr} AS BIGINT)) AS BIGINT) AS n_control,
         CAST(sum(CAST({treat_expr} AS BIGINT)
                  * CAST(round(CAST({y_expr} AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS s1,
         CAST(sum((1 - CAST({treat_expr} AS BIGINT))
                  * CAST(round(CAST({y_expr} AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS s0
  FROM {table_expr} GROUP BY 1
),
binned AS (
  SELECT bin, n_treated, n_control,
         CASE WHEN n_treated > 0 AND n_control > 0 THEN
           CAST(round((CAST(s1 AS DOUBLE) / CAST(n_treated AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n_control AS DOUBLE))
                      * 10000.0) AS BIGINT) END AS diff_micro,
         CAST(n_treated > 0 AND n_control > 0 AS INT) AS supported
  FROM per
),
gtot AS (
  SELECT CAST(sum(CASE WHEN supported = 1 THEN n_treated + n_control
                       ELSE 0 END) AS BIGINT) AS n_supported_units,
         CAST(sum(CASE WHEN supported = 1 THEN
                    diff_micro * (n_treated + n_control) ELSE 0 END)
              AS BIGINT) AS num
  FROM binned
)
SELECT bin, n_treated, n_control, diff_micro, supported,
       n_supported_units,
       CASE WHEN n_supported_units > 0 THEN
         CAST(num // n_supported_units AS BIGINT) END AS ate_micro
FROM binned, gtot
"""


def dispersion_index(
    df: DataFrame, group_cols: list[str], count_col: str
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio / Fano factor) of a
    per-period count series, per group — the burstiness one-number: a
    Poisson-stable process reads ~1, campaign/bot/batch-driven traffic
    reads >>1, a quota-capped feed reads <1. The triage stat every
    volume-anomaly dashboard starts from::

        (group..., n_periods, total_count, fano_ppm, overdispersed)

    Population variance over the PROVIDED periods from exact integer
    moments (``var_num = n·Σc² − (Σc)²``, decimal(38,0));
    ``fano = var/mean = var_num / (n·Σc)`` as ONE IEEE division rounded
    to ppm; ``overdispersed = fano_ppm > 10⁶``. All-zero series (mean
    0) → explicit NULL. The caller owns spine completion — zero-count
    periods only enter the variance if their rows exist (compose with
    the month/day spine operator upstream).

    Scale: one map-side-combinable moment fold per group. No window.
    """
    c = F.col(count_col).cast("long")
    dec = lambda x: x.cast("decimal(38,0)")  # noqa: E731
    agg = df.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.sum(c).cast("long").alias("total_count"),
        F.sum(dec(c) * dec(c)).alias("_sxx"),
    )
    var_num = (
        dec(F.col("n_periods")) * F.col("_sxx")
        - dec(F.col("total_count")) * dec(F.col("total_count"))
    )
    fano = F.when(
        F.col("total_count") > 0,
        F.round(
            var_num.cast("double")
            / (
                F.col("n_periods").cast("double")
                * F.col("total_count").cast("double")
            )
            * F.lit(1000000.0)
        ).cast("long"),
    )
    return agg.select(
        *[F.col(g) for g in group_cols],
        "n_periods",
        "total_count",
        fano.alias("fano_ppm"),
        F.when(fano.isNotNull(), (fano > 1_000_000).cast("int")).alias(
            "overdispersed"
        ),
    )


def dispersion_index_sql(
    table_expr: str, group_exprs: list[str], count_expr: str
) -> str:
    """DuckDB rendering of :func:`dispersion_index` — HUGEINT moments,
    same single rounded division."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    return f"""
WITH agg AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_periods,
         CAST(sum(CAST({count_expr} AS BIGINT)) AS BIGINT) AS total_count,
         sum(CAST(CAST({count_expr} AS BIGINT) AS HUGEINT)
             * CAST({count_expr} AS BIGINT)) AS sxx
  FROM {table_expr} {gby}
)
SELECT {gsel}n_periods, total_count,
       CASE WHEN total_count > 0 THEN
         CAST(round(CAST(CAST(n_periods AS HUGEINT) * sxx
                         - CAST(total_count AS HUGEINT) * total_count
                         AS DOUBLE)
                    / (CAST(n_periods AS DOUBLE) * CAST(total_count AS DOUBLE))
                    * 1000000.0) AS BIGINT) END AS fano_ppm,
       CASE WHEN total_count > 0 THEN
         CAST(CAST(round(CAST(CAST(n_periods AS HUGEINT) * sxx
                              - CAST(total_count AS HUGEINT) * total_count
                              AS DOUBLE)
                         / (CAST(n_periods AS DOUBLE)
                            * CAST(total_count AS DOUBLE))
                         * 1000000.0) AS BIGINT) > 1000000 AS INT) END
         AS overdispersed
FROM agg
"""


def mann_kendall_trend(
    df: DataFrame, group_cols: list[str], t_col: str, value_col: str
) -> DataFrame:
    """Mann-Kendall trend TEST per group — the significance companion
    of :func:`theil_sen_trend` (that one answers "how steep", this one
    "is it real"): the rank-based S statistic with the tie-corrected
    variance and its z-score (Mann 1945; Kendall 1975)::

        (group..., n_points, s_stat, var_s_x18, z_ppm)

    ``S = Σ_{i<j} sign(v_j − v_i)`` over the pairwise frame (exact
    integer), ``var_s_x18 = n(n−1)(2n+5) − Σ_g g(g−1)(2g+5)`` over
    value-tie groups (the EXACT 18·Var(S) integer — no division ever
    happens on it), and the continuity-corrected
    ``z = (S ∓ 1)/sqrt(var_s_x18/18)`` as ONE fixed IEEE
    sqrt/div sequence rounded to ppm (S = 0 → z = 0; var = 0, the
    all-tied series → explicit NULL z). |z| > 1.96e6 ppm is the usual
    5% call.

    Same BOUNDED-series contract as Theil-Sen: the pair join is
    C(points, 2) per group on the ROLLUP frame (day/week grains — the
    caller owns the pre-aggregation). Groups with < 2 points emit no
    row. Pairs at the SAME t are not comparable and contribute nothing
    to S (the strict ``t_i < t_j`` frame); a group whose rows all share
    one t therefore has zero comparable pairs and emits S = 0 (the tie
    census still sees its v ties, so var/z follow from there) — the S
    frame is LEFT-joined with a 0 default, never inner-joined.
    """
    base = df.select(
        *[F.col(c) for c in group_cols],
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    ).localCheckpoint(eager=False)  # pair join (x2) + tie census + count

    def _gjoin(l, r):
        cond = None
        for g in group_cols:
            eq = F.col(f"_l.{g}").eqNullSafe(F.col(f"_r.{g}"))
            cond = eq if cond is None else (cond & eq)
        return cond

    la, ra = base.alias("_l"), base.alias("_r")
    pair_cond = _gjoin(la, ra)
    pair_cond = (
        (F.col("_l._t") < F.col("_r._t"))
        if pair_cond is None
        else (pair_cond & (F.col("_l._t") < F.col("_r._t")))
    )
    s_stat = (
        la.join(ra, pair_cond)
        .select(
            *[F.col(f"_l.{g}") for g in group_cols],
            F.signum((F.col("_r._v") - F.col("_l._v")).cast("double"))
            .cast("long")
            .alias("_sgn"),
        )
        .groupBy(*group_cols)
        .agg(F.sum("_sgn").cast("long").alias("s_stat"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ties = (
        base.groupBy(*group_cols, "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_g"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_ngroups"),
            F.sum(
                dec(F.col("_g"))
                * dec(F.col("_g") - 1)
                * dec(F.lit(2) * F.col("_g") + 5)
            ).alias("_tie_term"),
            F.sum("_g").cast("long").alias("n_points"),
        )
    )
    # LEFT join: a group with no strictly-t-ordered pair (all rows on
    # one t) has zero comparable pairs -> S = 0, not a dropped group.
    if group_cols:
        t_al, s_al = ties.alias("_l"), s_stat.alias("_r")
        joined = t_al.join(s_al, _gjoin(t_al, s_al), "left")
    else:
        one = F.pmod(F.hash(F.lit(1)), F.lit(1))  # constant-key 1x1 join
        t_al = ties.withColumn("_one", one).alias("_l")
        s_al = s_stat.withColumn("_one", one).alias("_r")
        joined = t_al.join(F.broadcast(s_al), "_one", "left")
    n = F.col("_l.n_points")
    var18 = (
        dec(n) * dec(n - 1) * dec(F.lit(2) * n + 5) - F.col("_l._tie_term")
    )
    s = F.coalesce(F.col("_r.s_stat"), F.lit(0).cast("long"))
    z_num = F.when(s > 0, (s - 1).cast("double")).when(
        s < 0, (s + 1).cast("double")
    ).otherwise(F.lit(0.0))
    z = F.when(var18.cast("double") > F.lit(0.0),
        F.round(
            z_num
            / F.sqrt(var18.cast("double") / F.lit(18.0))
            * F.lit(1000000.0)
        ).cast("long"),
    )
    return joined.where(n > 1).select(
        *[F.col(f"_l.{g}") for g in group_cols],
        n.alias("n_points"),
        s.alias("s_stat"),
        var18.cast("long").alias("var_s_x18"),
        z.alias("z_ppm"),
    )


def mann_kendall_trend_sql(
    table_expr: str, group_exprs: list[str], t_expr: str, value_expr: str
) -> str:
    """DuckDB rendering of :func:`mann_kendall_trend` — same pair
    frame, same exact 18·Var integer, same continuity-corrected z."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    on = lambda a, b: (  # noqa: E731
        " AND ".join(f"{a}.{c} IS NOT DISTINCT FROM {b}.{c}" for c in group_exprs)
        or "TRUE"
    )
    gpre = lambda a: (", ".join(f"{a}.{c}" for c in group_exprs) + ", ") if g else ""  # noqa: E731,E501
    return f"""
WITH base AS (
  SELECT {gsel}CAST({t_expr} AS BIGINT) AS t, CAST({value_expr} AS BIGINT) AS v
  FROM {table_expr}
),
s AS (
  SELECT {gpre("a")}CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s_stat
  FROM base a JOIN base b ON {on("a", "b")} AND a.t < b.t
  {("GROUP BY " + ", ".join(f"a.{c}" for c in group_exprs)) if g else ""}
),
ties AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS ngroups,
         sum(CAST(gsz AS HUGEINT) * (gsz - 1) * (2 * gsz + 5)) AS tie_term,
         CAST(sum(gsz) AS BIGINT) AS n_points
  FROM (SELECT {gsel}v, CAST(count(*) AS BIGINT) AS gsz
        FROM base GROUP BY {gsel}v)
  {("GROUP BY " + g) if g else ""}
)
SELECT * FROM (
  SELECT {gpre("t2")}t2.n_points,
         CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
         CAST(CAST(t2.n_points AS HUGEINT) * (t2.n_points - 1)
              * (2 * t2.n_points + 5) - t2.tie_term AS BIGINT) AS var_s_x18,
         CASE WHEN CAST(CAST(t2.n_points AS HUGEINT) * (t2.n_points - 1)
                        * (2 * t2.n_points + 5) - t2.tie_term AS DOUBLE) > 0.0
         THEN CAST(round(
           (CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                 WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                 ELSE 0.0 END)
           / sqrt(CAST(CAST(t2.n_points AS HUGEINT) * (t2.n_points - 1)
                       * (2 * t2.n_points + 5) - t2.tie_term AS DOUBLE) / 18.0)
           * 1000000.0) AS BIGINT) END AS z_ppm
  FROM ties t2 LEFT JOIN s ON {on("t2", "s")}
  WHERE t2.n_points > 1
) _mk_out
"""


def diff_in_diff(
    df: DataFrame, treat_col: str, period_col: str, y_col: str
) -> DataFrame:
    """Difference-in-differences readout over a 2x2 (treated x
    pre/post) design — the parallel-trends causal workhorse (Card &
    Krueger 1994 canonically): how much MORE did the treated group move
    than the control group?::

        (treated, period, n, mean_micro, did_micro)

    Four cell means from exact integer cents sums (one IEEE division
    each), ``did = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)`` as the
    SAME fixed double sequence on both engines, rounded ONCE to
    micro-currency and repeated on every row (the density_ratio
    convention). Any missing cell (no treated-pre rows, say) → explicit
    NULL did — a 2x2 with an empty cell is a different design, not a
    zero. ``treat_col``/``period_col`` are 0/1.

    Scale: ONE grouped pass to the 4-cell frame; everything after is
    constant-size. No window, no join wider than 4 rows.
    """
    t = F.col(treat_col).cast("long")
    p = F.col(period_col).cast("long")
    cents = F.round(F.col(y_col).cast("double") * F.lit(100.0)).cast("long")
    cells = df.groupBy(t.alias("treated"), p.alias("period")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("_s"),
    )
    return did_from_cells(cells)


def did_from_cells(cells: DataFrame) -> DataFrame:
    """Difference-in-differences from an ALREADY-AGGREGATED 2x2 cell
    grid ``(treated, period, n, _s)`` (row counts + exact cents sums) —
    the MERGEABLE-STATE form of :func:`diff_in_diff` (which delegates
    here after its one grouped pass). The grid is what a per-(treated,
    period) ``streaming.streaming_group_sums`` counter maintains over a
    cents-folded outcome stream (rename ``n_g``→``n``, ``sum_g``→``_s``)
    and what shards merge by cell addition — so the parallel-trends
    contrast updates live as post-period outcomes arrive (pytest-pinned
    stream==batch). Everything here is constant-size."""
    mean_d = F.col("_s").cast("double") / F.col("n").cast("double")

    def cell_mean(tv: int, pv: int) -> Column:
        return F.max(
            F.when(
                (F.col("treated") == tv) & (F.col("period") == pv), mean_d
            )
        )

    did = (
        cells.groupBy()
        .agg(
            cell_mean(1, 1).alias("_m11"),
            cell_mean(1, 0).alias("_m10"),
            cell_mean(0, 1).alias("_m01"),
            cell_mean(0, 0).alias("_m00"),
        )
        .select(
            F.lit(0).alias("_k"),
            F.round(
                (
                    (F.col("_m11") - F.col("_m10"))
                    - (F.col("_m01") - F.col("_m00"))
                )
                * F.lit(10000.0)  # cents -> micro-currency
            )
            .cast("long")
            .alias("did_micro"),
        )
    )
    return (
        cells.withColumn("_k", F.lit(0))
        .join(F.broadcast(did), "_k")
        .select(
            "treated",
            "period",
            "n",
            F.round(mean_d * F.lit(10000.0)).cast("long").alias("mean_micro"),
            "did_micro",
        )
    )


def diff_in_diff_sql(
    table_expr: str, treat_expr: str, period_expr: str, y_expr: str
) -> str:
    """DuckDB rendering of :func:`diff_in_diff` — same 4-cell means,
    same fixed double sequence, one rounding."""
    return f"""
WITH cells AS (
  SELECT CAST({treat_expr} AS BIGINT) AS treated,
         CAST({period_expr} AS BIGINT) AS period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(CAST({y_expr} AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS s
  FROM {table_expr} GROUP BY 1, 2
),
did AS (
  SELECT CAST(round(
    ((max(CASE WHEN treated = 1 AND period = 1
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
      - max(CASE WHEN treated = 1 AND period = 0
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END))
     - (max(CASE WHEN treated = 0 AND period = 1
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
        - max(CASE WHEN treated = 0 AND period = 0
                   THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)))
    * 10000.0) AS BIGINT) AS did_micro
  FROM cells
)
SELECT treated, period, n,
       CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0) AS BIGINT)
         AS mean_micro,
       did_micro
FROM cells, did
"""
