"""Distributed data sketches for corpus-scale statistics.

The reference computes exact counts only (its logging `count()` calls,
SURVEY.md §2.5); at 100 TB a pipeline also needs sub-linear summaries.
Two classic sketches, implemented as pure ``pyspark.sql.functions``
expression trees over uniform hashed keys — and, unusually for sketches,
**deterministic and engine-portable**: every hash is the repo's 60-bit
md5 prefix (`text.md5_long`), every accumulator is exact BIGINT
arithmetic, and the only floating-point steps are single IEEE ops on
exactly-aggregated integers, so the DuckDB oracle rendering hash-matches
bit-for-bit (same discipline as ``curation.bigram_lm_score``).

- :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007) distinct
  count per group. Registers ride ONE map-side-combinable max-aggregation
  on (group, register) — 2^p keys per group — then one group-grained
  fold; no shuffle of raw values, memory O(2^p) per group regardless of
  cardinality. The register sum is kept as an exact BIGINT (each
  register contributes ``1 << (49 - M)``, i.e. 2^-M scaled by 2^49 —
  with p=12 and a 60-bit hash the total stays < 2^62), so aggregation
  order cannot perturb the estimate.
- :func:`countmin_counts` / :func:`countmin_estimate` — count-min sketch
  (Cormode & Muthukrishnan 2005): DEPTH×WIDTH counter matrix built by
  one (row, col)-keyed count aggregation (DEPTH×WIDTH keys total — tiny,
  broadcastable); point estimates are the min over DEPTH cells, an
  upper bound on the true count by construction (property-tested).

Scale notes: both sketches reduce an unbounded key space to a fixed grid
before any shuffle, so the shuffle volume is O(groups × 2^p) resp.
O(DEPTH × WIDTH) — independent of row count. That is the whole point of
a sketch at 100 TB: the exact alternative shuffles every distinct key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.text import md5_long, md5_long_sql

__all__ = [
    "HLL_P",
    "HLL_M",
    "hll_distinct",
    "hll_registers",
    "hll_fold",
    "hll_distinct_sql",
    "CM_DEPTH",
    "CM_WIDTH",
    "countmin_counts",
    "countmin_estimate",
    "CM_ROWS_SQL",
    "countmin_col_sql",
    "profile_columns",
    "profile_columns_sql",
    "BLOOM_BITS",
    "BLOOM_K",
    "bloom_build",
    "bloom_filter_keys",
    "bloom_bits_sql",
    "hdr_wasserstein_from_hists",
    "hdr_wasserstein_drift",
    "hdr_wasserstein_drift_sql",
    "QH_SIG_BITS",
    "hdr_histogram",
    "hdr_quantiles",
    "hdr_quantile_sql",
    "hll_set_algebra",
    "hdr_percentile_calibrate",
    "hll_set_algebra_sql",
    "hdr_percentile_calibrate_sql",
    "hdr_distribution_drift",
    "hdr_distribution_drift_sql",
    "hdr_drift_from_hists",
]


# --- HyperLogLog -----------------------------------------------------------

HLL_P = 12                      # 2^12 = 4096 registers; rel. error ~1.04/sqrt(m)
HLL_M = 1 << HLL_P
# remaining hash bits after the register index: 60 - p = 48; rho in [1, 49]
_HLL_RHO_MAX = 60 - HLL_P + 1
# 2^-M scaled to BIGINT: empty register (M=0) contributes 2^49
_HLL_SCALE_POW = _HLL_RHO_MAX
_HLL_EMPTY_TERM = 1 << _HLL_SCALE_POW
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^49 — precomputed once, embedded as the SAME double
# literal in both engines so the final division is a single IEEE op.
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(_HLL_EMPTY_TERM)


def hll_distinct(group_cols: list[str], value_col: str):
    """Approximate ``COUNT(DISTINCT value_col)`` per group via HLL.

    Returns ``(group..., empty_registers, est_distinct)`` where
    ``est_distinct`` is the HLL estimate with the standard linear-counting
    small-range correction (E ≤ 2.5·m and some register empty →
    ``m·ln(m/V)``), rounded to 3 decimals.

    Determinism: register index = low p bits of the 60-bit md5 hash,
    rank = 49 − bitlength(high 48 bits) via ``bin()`` string length
    (integer/string ops only — both engines agree exactly); the register
    sum is exact BIGINT; ln/division are single IEEE ops on identical
    inputs, and the 3-decimal round absorbs any last-ulp libm skew.
    """

    def apply(df: DataFrame) -> DataFrame:
        return df.transform(hll_registers(group_cols, value_col)).transform(
            hll_fold(group_cols)
        )

    return apply


def hll_registers(group_cols: list[str], value_col: str):
    """Stage 1: the register frame ``(group..., _reg, _m)`` — max rank per
    (group, register). This is a plain max-aggregation, so it ALSO runs
    as a Structured Streaming stateful aggregation (update/complete
    mode): registers are the natural mergeable sketch state, and the
    streaming register frame folds to the identical estimate as a batch
    pass over the same rows (streaming/__init__.streaming_hll)."""

    def apply(df: DataFrame) -> DataFrame:
        h = md5_long(F.col(value_col).cast("string"))
        w = F.shiftright(h, HLL_P)
        bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
        return (
            df.select(
                *group_cols,
                F.pmod(h, F.lit(HLL_M)).alias("_reg"),
                (F.lit(_HLL_RHO_MAX) - bitlen).cast("long").alias("_rho"),
            )
            .groupBy(*group_cols, "_reg")
            .agg(F.max("_rho").alias("_m"))
        )

    return apply


def hll_fold(group_cols: list[str]):
    """Stage 2: fold a register frame (possibly re-merged across runs or
    micro-batches — max-merge first if registers repeat) to
    ``(group..., empty_registers, est_distinct)``."""

    def apply(regs: DataFrame) -> DataFrame:
        term = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_SCALE_POW} - _m AS INT))"
        )
        folded = regs.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("_hit"),
            F.sum(term).alias("_s_hit"),
        )
        v = (F.lit(HLL_M) - F.col("_hit")).cast("long")
        s = F.col("_s_hit") + v * F.lit(_HLL_EMPTY_TERM)
        est = _hll_estimate(s, v)
        return folded.select(
            *group_cols,
            v.alias("empty_registers"),
            F.round(est, 3).alias("est_distinct"),
        )

    return apply


def hll_distinct_sql(table_expr: str, group_cols: list[str], value_expr: str) -> str:
    """DuckDB rendering of :func:`hll_distinct` — same constants, same
    expression shape, bit-identical output."""
    g = ", ".join(group_cols)
    h = md5_long_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hll_regs AS (
  SELECT {g}, reg, max(rho) AS m
  FROM (
    SELECT {g},
           h % {HLL_M} AS reg,
           CAST({_HLL_RHO_MAX} - (CASE WHEN (h >> {HLL_P}) = 0 THEN 0
                 ELSE length(bin(h >> {HLL_P})) END) AS BIGINT) AS rho
    FROM (SELECT {g}, {h} AS h FROM {table_expr})
  ) GROUP BY {g}, reg
),
hll_fold AS (
  SELECT {g}, count(*) AS hit,
         sum(CAST(1 AS BIGINT) << CAST({_HLL_SCALE_POW} - m AS INT)) AS s_hit
  FROM hll_regs GROUP BY {g}
)
SELECT {g},
       CAST({HLL_M} - hit AS BIGINT) AS empty_registers,
       round(
         CASE WHEN ({_HLL_NUM!r} / CAST(s_hit + ({HLL_M} - hit) * CAST({_HLL_EMPTY_TERM} AS BIGINT) AS DOUBLE)) <= {2.5 * HLL_M!r}
                   AND ({HLL_M} - hit) > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - hit AS DOUBLE))
              ELSE {_HLL_NUM!r} / CAST(s_hit + ({HLL_M} - hit) * CAST({_HLL_EMPTY_TERM} AS BIGINT) AS DOUBLE)
         END, 3) AS est_distinct
FROM hll_fold
"""


# --- Count-min sketch ------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_col(key: Column, row: Column) -> Column:
    """Column index for sketch row ``row``: seeded 60-bit md5 % WIDTH."""
    return F.pmod(
        md5_long(F.concat(F.lit("cm"), row.cast("string"), F.lit(":"), key)),
        F.lit(CM_WIDTH),
    )


def countmin_counts(
    df: DataFrame, key_col: str, weight_col: str | None = None
) -> DataFrame:
    """Build the DEPTH×WIDTH counter matrix over a key stream.

    Returns ``(r, c, cnt)`` — at most DEPTH×WIDTH rows no matter how many
    input rows or distinct keys. Each input row fans out DEPTH times
    map-side, then ONE aggregation on the (r, c) grid (map-side
    combinable, 4096 keys total).

    ``weight_col``: build from a PRE-AGGREGATED ``(key, count)`` frame
    instead of the raw stream — identical sketch, but the DEPTH-way
    fan-out and md5 hashing run over distinct keys only (and when the
    caller also needs exact per-key counts, the aggregate is shared via
    ReuseExchange instead of exploding the stream twice).
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("r")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(F.col(key_col).alias("_k"), w.cast("long").alias("_w"))
        .select("_k", "_w", rows)
        .select("r", _cm_col(F.col("_k"), F.col("r")).alias("c"), "_w")
        .groupBy("r", "c")
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate each key's count: min over ALL its DEPTH cells.

    The sketch side is ≤ DEPTH×WIDTH rows — broadcast it so the probe is
    a map-side hash join regardless of how many keys are queried.
    Estimates are exact integers and ≥ the true count by construction.

    The sketch frame is SPARSE (untouched cells have no row), so the
    probe LEFT-joins and reads a missing cell as 0 — an inner join would
    take the min over only the collided cells (inflating an absent key's
    estimate) and would drop a key whose cells are all empty entirely,
    instead of answering the canonical 0.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("r")
    probes = keys.select(F.col(key_col), rows).select(
        key_col, "r", _cm_col(F.col(key_col), F.col("r")).alias("c")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long").alias("cm_estimate")
        )
    )


#: DuckDB FROM-fragment enumerating the sketch rows (cross-join against
#: the key stream; ``r`` then feeds :func:`countmin_col_sql`).
CM_ROWS_SQL = f"(SELECT unnest(range({CM_DEPTH})) AS r) cm_rows"


def countmin_col_sql(key_expr: str) -> str:
    """DuckDB column index for ``key_expr`` at sketch row ``r`` (in
    scope via :data:`CM_ROWS_SQL`) — matches :func:`_cm_col` exactly."""
    col = md5_long_sql(f"'cm' || CAST(r AS VARCHAR) || ':' || ({key_expr})")
    return f"({col}) % {CM_WIDTH}"


# --- One-pass table profiler -----------------------------------------------

def profile_columns(cols: list[str]):
    """Data-profiling sweep: per column, ``(col_name, n_rows, n_null,
    est_distinct)`` in ONE pass over the table — the pre-flight check a
    pipeline runs before trusting a new extract.

    Columns melt to ``(col_name, value-as-string)`` rows (per-row
    expression, no shuffle), then null/row counts and the HLL distinct
    estimate aggregate per column — shuffle O(|cols| × 2^p), independent
    of row count. Distinct counting is over NON-NULL values (NULL would
    otherwise occupy a phantom register). ``est_distinct`` is 0.0 for an
    all-NULL column.

    Float/decimal columns should be profiled via an explicit exact cast
    (engine string renderings of doubles differ in scientific-notation
    thresholds); integer and string columns render identically everywhere.
    """

    def apply(df: DataFrame) -> DataFrame:
        melted = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("string").alias("_v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("_m")
        ).select("_m.col_name", "_m._v")
        base = melted.groupBy("col_name").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        )
        hll = melted.filter(F.col("_v").isNotNull()).transform(
            hll_distinct(["col_name"], "_v")
        )
        return base.join(hll.select("col_name", "est_distinct"), "col_name", "left").select(
            "col_name",
            "n_rows",
            "n_null",
            F.coalesce("est_distinct", F.lit(0.0)).alias("est_distinct"),
        )

    return apply


def profile_columns_sql(table: str, cols: list[str]) -> str:
    """DuckDB rendering of :func:`profile_columns`."""
    arms = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS v FROM {table}"
        for c in cols
    )
    hll = hll_distinct_sql("melted WHERE v IS NOT NULL", ["col_name"], "v")
    return f"""
WITH melted AS (
{arms}
),
base AS (
  SELECT col_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
  FROM melted GROUP BY 1
)
SELECT b.col_name, b.n_rows, b.n_null,
       coalesce(h.est_distinct, 0.0) AS est_distinct
FROM base b LEFT JOIN ({hll}) h USING (col_name)
"""


# --- Bloom filter -----------------------------------------------------------

BLOOM_BITS = 1 << 16   # 65536 bits
BLOOM_K = 4            # hash functions


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build a Bloom filter (Bloom 1970) over a key set as its SET BIT
    POSITIONS — ``(pos)`` rows, at most min(distinct_keys·K, BLOOM_BITS).

    The 100 TB use: ship the small side's membership to the big side's
    scan BEFORE an expensive join — the bit table is ≤ 65536 rows
    (broadcastable by construction) no matter how many keys went in.
    One map-side-combinable distinct on the uniform bit position.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("r")
    return (
        df.select(F.col(key_col).cast("string").alias("_k"))
        .select("_k", rows)
        .select(
            F.pmod(
                md5_long(F.concat(F.lit("bf"), F.col("r").cast("string"),
                                  F.lit(":"), F.col("_k"))),
                F.lit(BLOOM_BITS),
            ).alias("pos")
        )
        .distinct()
    )


def bloom_filter_keys(probe: DataFrame, bits: DataFrame, key_col: str) -> DataFrame:
    """Keep only probe rows whose key is POSSIBLY in the built set: all K
    bit positions present (false positives possible, false negatives
    impossible — pytest-pinned). The membership test runs on the probe's
    DISTINCT keys against the broadcast bit table; the final left-semi
    prunes the payload, and AQE broadcasts the surviving-key side when
    the filter bites (which is exactly when bloom pruning pays off).
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("r")
    hits = (
        probe.select(F.col(key_col).alias("_k")).distinct()
        .withColumn("_ks", F.col("_k").cast("string"))
        .select("_k", "_ks", rows)
        .select(
            "_k",
            F.pmod(
                md5_long(F.concat(F.lit("bf"), F.col("r").cast("string"),
                                  F.lit(":"), F.col("_ks"))),
                F.lit(BLOOM_BITS),
            ).alias("pos"),
        )
        .join(F.broadcast(bits), "pos")
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == BLOOM_K)
        .select(F.col("_k").alias(key_col))
    )
    return probe.join(hits, key_col, "left_semi")


def bloom_bits_sql(table: str, key_expr: str) -> str:
    """DuckDB rendering of :func:`bloom_build`."""
    h = md5_long_sql(f"'bf' || CAST(r AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)")
    return (
        f"SELECT DISTINCT ({h}) % {BLOOM_BITS} AS pos"
        f" FROM {table} CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS r) bf_rows"
    )


# --- HDR-style quantile histogram -------------------------------------------

QH_SIG_BITS = 6  # significant bits kept per value: rel. error ≤ 2^-(6-1) ≈ 3.1%


def hdr_histogram(group_cols: list[str], value_col: str):
    """Mergeable quantile histogram over a NON-NEGATIVE BIGINT column
    (HDR-histogram bucketing, Tene's High Dynamic Range histogram): each
    value keeps its top QH_SIG_BITS significant bits — bucket lower bound
    ``(v >> s) << s`` with ``s = max(msb(v) - QH_SIG_BITS, 0)`` — giving a
    bounded relative error of 2^-(QH_SIG_BITS-1) per bucket across the
    full 63-bit range, with ≤ ~2k distinct buckets per group EVER.

    All bucket math is integer-only (``length(bin(v))`` is the exact msb
    position — no float log2, whose 1-ulp wobble near powers of two would
    bucket differently across engines), so Spark and DuckDB histograms are
    bit-identical, and counts merge by addition (sketch property: compute
    per partition / per day, fold later).

    Scale: the ONLY shuffle is the (group, bucket) count — O(groups × 2k)
    rows regardless of input size. The exact alternative (sort or
    percentile_approx over raw values) shuffles every row; at 100 TB this
    histogram is the difference between a quantile dashboard refreshing in
    seconds and a full-table sort.

    Returns ``group_cols + (bucket_lo, n)``.
    """

    def apply(df: DataFrame) -> DataFrame:
        m = F.length(F.bin(F.col(value_col)))
        shift = F.greatest(m - F.lit(QH_SIG_BITS), F.lit(0)).cast("int")
        return (
            df.withColumn("_qs", shift)
            .withColumn(
                "bucket_lo",
                F.expr(
                    f"shiftleft(shiftright(cast({value_col} AS BIGINT), _qs), _qs)"
                ),
            )
            .groupBy(*group_cols, "bucket_lo")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    return apply


def hdr_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[str, int, int]],
) -> DataFrame:
    """Per-group quantile estimates from an :func:`hdr_histogram` frame.

    ``quantiles`` is a list of ``(label, num, den)`` exact fractions —
    e.g. ``("p95", 95, 100)``. The answer for q = num/den is the smallest
    ``bucket_lo`` whose cumulative count reaches ``ceil(q·N)`` (the
    classic lower-quantile definition) — pure BIGINT arithmetic, so both
    engines agree bit-for-bit. The histogram is tiny (groups × ~2k rows),
    so the window pass here costs nothing; the heavy lifting happened in
    the one sketch aggregation.

    Returns ``group_cols + (quantile, approx_value)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*group_cols)
    cum = (
        hist.withColumn("_cum", F.sum("n").over(w))
        .withColumn("_tot", F.sum("n").over(tot))
    )
    qs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("quantile"),
                F.lit(num).cast("long").alias("_num"),
                F.lit(den).cast("long").alias("_den"),
            )
            for lbl, num, den in quantiles
        ]
    )
    exploded = cum.withColumn("_q", F.explode(qs)).select(
        *group_cols,
        "bucket_lo",
        "_cum",
        F.col("_q.quantile").alias("quantile"),
        F.expr("(_tot * _q._num + _q._den - 1) div _q._den").alias("_thr"),
    )
    return (
        exploded.filter(F.col("_cum") >= F.col("_thr"))
        .groupBy(*group_cols, "quantile")
        .agg(F.min("bucket_lo").alias("approx_value"))
    )


def hdr_quantile_sql(
    table_expr: str,
    group_cols: list[str],
    value_expr: str,
    quantiles: list[tuple[str, int, int]],
) -> str:
    """DuckDB oracle for hdr_histogram → hdr_quantiles: identical integer
    bucket math (``(v >> s) << s``) and threshold arithmetic."""
    g = ", ".join(group_cols)
    q_rows = ", ".join(f"('{lbl}', {num}, {den})" for lbl, num, den in quantiles)
    return f"""
WITH qh_vals AS (SELECT {g}, CAST({value_expr} AS BIGINT) AS v FROM {table_expr}),
qh_hist AS (
  SELECT {g},
         (v >> greatest(length(bin(v)) - {QH_SIG_BITS}, 0))
            << greatest(length(bin(v)) - {QH_SIG_BITS}, 0) AS bucket_lo,
         count(*) AS n
  FROM qh_vals GROUP BY ALL
),
qh_cum AS (
  SELECT {g}, bucket_lo,
         sum(n) OVER (PARTITION BY {g} ORDER BY bucket_lo) AS cum,
         sum(n) OVER (PARTITION BY {g}) AS tot
  FROM qh_hist
),
qh_q AS (SELECT * FROM (VALUES {q_rows}) AS t(quantile, num, den))
SELECT {g}, quantile, min(bucket_lo) AS approx_value
FROM qh_cum JOIN qh_q ON cum >= (tot * num + den - 1) // den
GROUP BY ALL
"""


def _hll_estimate(s_col: Column, v_col: Column) -> Column:
    """The HLL fold formula on an exact-BIGINT register-term sum ``s`` and
    empty-register count ``v`` (linear-counting small-range correction
    included) — shared by :func:`hll_fold` and :func:`hll_set_algebra`."""
    e_raw = F.lit(_HLL_NUM) / s_col.cast("double")
    return F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_col > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_col.cast("double")),
    ).otherwise(e_raw)


def hll_set_algebra(df: DataFrame, set_col: str, value_col: str) -> DataFrame:
    """Pairwise set algebra over HLL sketches: for every pair of sets
    (distinct ``set_col`` values) estimate ``|A|``, ``|B|``, ``|A∪B|``,
    ``|A∩B|`` (inclusion–exclusion) and the Jaccard similarity — the
    sketch-side answer to "how much do these two corpora overlap?" that
    never rescans the raw rows.

    Union registers are max-merges, but enumerating set pairs with a
    cross join would be both flagged and wrong at scale. Instead the
    register frame (O(sets × 2^p) rows) self-joins on the REGISTER id — a
    uniform 4096-value equi key — producing, per pair, the registers both
    sets populate; registers only ONE side holds are recovered from each
    set's own totals by subtraction:

        s_union = s_max(shared) + (s_A − s_A(shared)) + (s_B − s_B(shared))
        hit_union = hit_A + hit_B − hit_shared

    All sums are exact BIGINT, so the union estimate is bit-identical to
    physically max-merging the registers (pytest-pinned), and the whole
    computation is two tiny aggregations + one equi-join — the raw table
    is scanned exactly once (by :func:`hll_registers`).

    Returns ``(set_a, set_b, est_a, est_b, est_union, est_intersect,
    jaccard_micro)`` for every unordered pair with ``set_a < set_b``;
    ``est_intersect`` clamps at 0 (inclusion–exclusion on estimates can go
    slightly negative for disjoint sets), and ``jaccard_micro`` is an
    integer in [0, 1e6].
    """
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_SCALE_POW} - _m AS INT))")
    regs = (
        df.transform(hll_registers([set_col], value_col))
        .select(set_col, "_reg", term.alias("_t"))
        .localCheckpoint(eager=False)  # referenced 3x: totals + both join sides
    )
    totals = regs.groupBy(set_col).agg(
        F.count(F.lit(1)).alias("_hit"), F.sum("_t").alias("_s")
    )
    a = regs.select(
        F.col(set_col).alias("set_a"), "_reg", F.col("_t").alias("_ta")
    )
    b = regs.select(
        F.col(set_col).alias("set_b"), "_reg", F.col("_t").alias("_tb")
    )
    shared = (
        a.join(b, "_reg")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(
            F.count(F.lit(1)).alias("_hit_sh"),
            F.sum(F.least("_ta", "_tb")).alias("_s_max"),  # smaller term == larger rho
            F.sum("_ta").alias("_s_a_sh"),
            F.sum("_tb").alias("_s_b_sh"),
        )
    )
    ta = totals.select(
        F.col(set_col).alias("set_a"), F.col("_hit").alias("_hit_a"), F.col("_s").alias("_s_a")
    )
    tb = totals.select(
        F.col(set_col).alias("set_b"), F.col("_hit").alias("_hit_b"), F.col("_s").alias("_s_b")
    )
    j = shared.join(ta, "set_a").join(tb, "set_b")
    hit_union = F.col("_hit_a") + F.col("_hit_b") - F.col("_hit_sh")
    v_union = (F.lit(HLL_M) - hit_union).cast("long")
    s_union = (
        F.col("_s_max")
        + (F.col("_s_a") - F.col("_s_a_sh"))
        + (F.col("_s_b") - F.col("_s_b_sh"))
        + v_union * F.lit(_HLL_EMPTY_TERM)
    )
    v_a = (F.lit(HLL_M) - F.col("_hit_a")).cast("long")
    v_b = (F.lit(HLL_M) - F.col("_hit_b")).cast("long")
    est_a = _hll_estimate(F.col("_s_a") + v_a * F.lit(_HLL_EMPTY_TERM), v_a)
    est_b = _hll_estimate(F.col("_s_b") + v_b * F.lit(_HLL_EMPTY_TERM), v_b)
    est_u = _hll_estimate(s_union, v_union)
    est_i = F.greatest(est_a + est_b - est_u, F.lit(0.0))
    return j.select(
        "set_a",
        "set_b",
        F.round(est_a, 3).alias("est_a"),
        F.round(est_b, 3).alias("est_b"),
        F.round(est_u, 3).alias("est_union"),
        F.round(est_i, 3).alias("est_intersect"),
        F.round(est_i / est_u * F.lit(1_000_000.0), 0)
        .cast("long")
        .alias("jaccard_micro"),
    )


# NOTE: pairs that share ZERO populated registers are omitted from
# hll_set_algebra's output (no row survives the register equi-join). At
# p=12 that needs both sets to miss each other across all 4096 registers
# — vanishingly unlikely beyond toy sizes; callers needing the full pair
# matrix left-join the distinct-set universe. Staged for the r8 battery
# window (pytest-gated this round: tests/test_sketches.py).


def hdr_percentile_calibrate(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Percentile calibration (quantile normalization) of a non-negative
    BIGINT score column against its own per-group distribution — the
    standard move before mixing quality scores across domains whose raw
    scales differ (a 0.7 from one classifier is not a 0.7 from another).

    Exact percent_rank would globally sort every row per group; instead
    each row joins the tiny cumulative :func:`hdr_histogram` (≤ ~2k
    buckets/group — broadcastable by construction) on its own bucket and
    takes ``pct_micro = (rows strictly below bucket) · 1e6 div N``: a
    lower-bound percentile with the histogram's 2^-(sig_bits-1) relative
    value error, integer-exact and engine-portable. The fact is scanned
    once; nothing heavier than a broadcast join touches it.

    Returns the input columns + ``pct_micro`` in [0, 1e6).
    """
    from pyspark.sql import Window

    hist = df.transform(hdr_histogram(group_cols, value_col))
    w = Window.partitionBy(*group_cols).orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        hist.withColumn("_below", F.sum("n").over(w) - F.col("n"))
        .withColumn("_tot", F.sum("n").over(Window.partitionBy(*group_cols)))
        .select(*group_cols, "bucket_lo", "_below", "_tot")
    )
    m = F.length(F.bin(F.col(value_col)))
    shift = F.greatest(m - F.lit(QH_SIG_BITS), F.lit(0)).cast("int")
    bucketed = df.withColumn("_qs", shift).withColumn(
        "bucket_lo",
        F.expr(f"shiftleft(shiftright(cast({value_col} AS BIGINT), _qs), _qs)"),
    )
    return (
        bucketed.join(F.broadcast(cum), [*group_cols, "bucket_lo"])
        .withColumn("pct_micro", F.expr("(_below * 1000000L) div _tot"))
        .drop("_qs", "bucket_lo", "_below", "_tot")
    )


def hll_set_algebra_sql(table_expr: str, set_expr: str, value_expr: str) -> str:
    """DuckDB rendering of :func:`hll_set_algebra` — same register frame,
    same self-join + subtraction, same single-IEEE-op fold sequence."""
    h = md5_long_sql(f"CAST({value_expr} AS VARCHAR)")
    num, lim, m_f = f"{_HLL_NUM!r}", f"{2.5 * HLL_M!r}", f"{float(HLL_M)!r}"

    def est(s: str, v: str) -> str:
        return (
            f"CASE WHEN ({num} / CAST({s} AS DOUBLE)) <= {lim} AND ({v}) > 0 "
            f"THEN {m_f} * ln({m_f} / CAST({v} AS DOUBLE)) "
            f"ELSE {num} / CAST({s} AS DOUBLE) END"
        )

    s_a = f"CAST(s_a + ({HLL_M} - hit_a) * CAST({_HLL_EMPTY_TERM} AS BIGINT) AS BIGINT)"
    s_b = f"CAST(s_b + ({HLL_M} - hit_b) * CAST({_HLL_EMPTY_TERM} AS BIGINT) AS BIGINT)"
    s_u = (
        f"CAST(s_max + (s_a - s_a_sh) + (s_b - s_b_sh) "
        f"+ ({HLL_M} - (hit_a + hit_b - hit_sh)) * CAST({_HLL_EMPTY_TERM} AS BIGINT) AS BIGINT)"
    )
    v_a, v_b = f"({HLL_M} - hit_a)", f"({HLL_M} - hit_b)"
    v_u = f"({HLL_M} - (hit_a + hit_b - hit_sh))"
    e_a, e_b, e_u = est(s_a, v_a), est(s_b, v_b), est(s_u, v_u)
    e_i = f"greatest(({e_a}) + ({e_b}) - ({e_u}), 0.0)"
    return f"""
WITH regs AS (
  SELECT s, reg, max(rho) AS m
  FROM (
    SELECT {set_expr} AS s,
           h % {HLL_M} AS reg,
           CAST({_HLL_RHO_MAX} - (CASE WHEN (h >> {HLL_P}) = 0 THEN 0
                 ELSE length(bin(h >> {HLL_P})) END) AS BIGINT) AS rho
    FROM (SELECT {set_expr}, {h} AS h FROM {table_expr})
  ) GROUP BY s, reg
),
terms AS (
  SELECT s, reg, CAST(1 AS BIGINT) << CAST({_HLL_SCALE_POW} - m AS INT) AS t
  FROM regs
),
totals AS (
  SELECT s, count(*) AS hit, CAST(sum(t) AS BIGINT) AS st FROM terms GROUP BY s
),
shared AS (
  SELECT a.s AS set_a, b.s AS set_b, count(*) AS hit_sh,
         CAST(sum(least(a.t, b.t)) AS BIGINT) AS s_max,
         CAST(sum(a.t) AS BIGINT) AS s_a_sh,
         CAST(sum(b.t) AS BIGINT) AS s_b_sh
  FROM terms a JOIN terms b ON a.reg = b.reg AND a.s < b.s
  GROUP BY 1, 2
),
j AS (
  SELECT shared.*, ta.hit AS hit_a, ta.st AS s_a, tb.hit AS hit_b, tb.st AS s_b
  FROM shared
  JOIN totals ta ON ta.s = shared.set_a
  JOIN totals tb ON tb.s = shared.set_b
)
SELECT set_a, set_b,
       round({e_a}, 3) AS est_a,
       round({e_b}, 3) AS est_b,
       round({e_u}, 3) AS est_union,
       round({e_i}, 3) AS est_intersect,
       CAST(round(({e_i}) / ({e_u}) * 1000000.0, 0) AS BIGINT) AS jaccard_micro
FROM j
"""


def hdr_percentile_calibrate_sql(
    table_expr: str, group_cols: list[str], value_expr: str
) -> str:
    """DuckDB rendering of :func:`hdr_percentile_calibrate` (payload = the
    group cols + value only; callers carrying more columns adapt the outer
    select)."""
    g = ", ".join(group_cols)
    return f"""
WITH b AS (
  SELECT {g}, v, (v >> qs) << qs AS bucket_lo
  FROM (
    SELECT {g}, CAST({value_expr} AS BIGINT) AS v,
           CAST(greatest(length(bin(CAST({value_expr} AS BIGINT))) - {QH_SIG_BITS}, 0) AS INT) AS qs
    FROM {table_expr}
  )
),
hist AS (SELECT {g}, bucket_lo, count(*) AS n FROM b GROUP BY {g}, bucket_lo),
cum AS (
  SELECT {g}, bucket_lo,
         CAST(sum(n) OVER (PARTITION BY {g} ORDER BY bucket_lo) - n AS BIGINT) AS below,
         CAST(sum(n) OVER (PARTITION BY {g}) AS BIGINT) AS tot
  FROM hist
)
SELECT b.{g.replace(', ', ', b.')}, b.v, CAST((below * 1000000) // tot AS BIGINT) AS pct_micro
FROM b JOIN cum USING ({g}, bucket_lo)
"""


def hdr_distribution_drift(
    old: DataFrame, new: DataFrame, value_col: str
) -> DataFrame:
    """Distribution drift between two versions of a non-negative BIGINT
    column, as exact-integer TOTAL VARIATION DISTANCE over the shared HDR
    bucketing: ``tvd_ppm = SUM |share_new - share_old| div 2`` with each
    share an exact ppm (``n_bucket * 1e6 div n_total``). One row out::

        (n_old, n_new, n_buckets, tvd_ppm)

    TVD is the integer-exact drift metric (0 = identical binned shapes,
    1e6 = disjoint support); PSI's per-bucket ``ln`` would drag the whole
    comparison into cross-engine float territory for no operational gain.
    Scale: two histogram aggregations (each O(~2k buckets) out) + one
    full-outer bucket join of two tiny frames — input size never touches
    the comparison stage. Monitors the same column across loads without
    retaining either version's rows.
    """
    ho = old.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    hn = new.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_new")
    )
    return hdr_drift_from_hists(ho, hn)


def hdr_drift_from_hists(ho: DataFrame, hn: DataFrame) -> DataFrame:
    """TVD from two PRE-BUILT HDR histograms — ``(bucket_lo, n_old)`` and
    ``(bucket_lo, n_new)``. The sketch-native entry point: histograms are
    the mergeable artifact (persisted per load, or snapshotted live from
    ``streaming.streaming_hdr_histogram``), so drift between any two
    loads — or between the live stream and a reference — never rereads
    rows. :func:`hdr_distribution_drift` is this + two histogram scans."""
    j = (
        ho.join(hn, "bucket_lo", "full_outer")
        .select(
            "bucket_lo",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .localCheckpoint(eager=False)  # totals + shares read it twice
    )
    tot = j.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.lit(1).alias("_k"),
    )
    shares = (
        j.withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .withColumn("sh_old", F.expr("(n_old * 1000000L) div t_old"))
        .withColumn("sh_new", F.expr("(n_new * 1000000L) div t_new"))
    )
    return shares.groupBy("t_old", "t_new", "n_buckets").agg(
        F.expr("sum(abs(sh_new - sh_old)) div 2").alias("tvd_ppm")
    ).select(
        F.col("t_old").alias("n_old"),
        F.col("t_new").alias("n_new"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("tvd_ppm").cast("long").alias("tvd_ppm"),
    )


def hdr_distribution_drift_sql(
    old_cte: str, new_cte: str, value_expr: str
) -> str:
    """DuckDB rendering of :func:`hdr_distribution_drift` — identical
    integer bucketing, shares, and TVD fold."""
    def hist(src: str) -> str:
        return f"""
  SELECT (v >> qs) << qs AS bucket_lo, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT CAST({value_expr} AS BIGINT) AS v,
           CAST(greatest(length(bin(CAST({value_expr} AS BIGINT)))
                         - {QH_SIG_BITS}, 0) AS INT) AS qs
    FROM {src}
  ) GROUP BY 1"""

    return f"""
WITH old_v AS ({old_cte}),
new_v AS ({new_cte}),
ho AS ({hist('old_v')}),
hn AS ({hist('new_v')}),
j AS (
  SELECT coalesce(ho.bucket_lo, hn.bucket_lo) AS bucket_lo,
         coalesce(ho.n, 0) AS n_old, coalesce(hn.n, 0) AS n_new
  FROM ho FULL OUTER JOIN hn ON ho.bucket_lo = hn.bucket_lo
),
tot AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM j
)
SELECT t_old AS n_old, t_new AS n_new, n_buckets,
       CAST(sum(abs((n_new * 1000000) // t_new
                    - (n_old * 1000000) // t_old)) // 2 AS BIGINT) AS tvd_ppm
FROM j, tot
GROUP BY t_old, t_new, n_buckets
"""


def hdr_wasserstein_from_hists(ho: DataFrame, hn: DataFrame) -> DataFrame:
    """Earth-mover (Wasserstein-1) drift from two PRE-BUILT HDR
    histograms, exact integers end-to-end::

        (n_old, n_new, n_buckets, emd_ppm_units)

    ``emd_ppm_units = Σ_i |CDF_old(i) − CDF_new(i)| · (lo_{i+1} − lo_i)``
    over the bucket-sorted union — each CDF an exact ppm and each segment
    width an exact BIGINT of VALUE units, so the metric is ppm·units of
    "mass × distance moved". Complements :func:`hdr_drift_from_hists`'s
    TVD: TVD sees THAT mass moved, W1 sees HOW FAR (a +1-bucket shift and
    a +100-bucket shift have equal TVD but very different W1). The
    per-bucket ``ln`` of PSI/KL stays rejected (float territory); W1
    needs only |cumsum| · width — integer-exact.

    Scale: identical to the TVD path — two ~2k-bucket frames, one
    full-outer join, one bounded window over the bucket frame (≤2k rows
    by construction, never row-scaled).
    """
    from pyspark.sql import Window

    j = (
        ho.join(hn, "bucket_lo", "full_outer")
        .select(
            "bucket_lo",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .localCheckpoint(eager=False)  # totals + cumulative read it twice
    )
    tot = j.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.lit(1).alias("_k"),
    )
    w = Window.orderBy("bucket_lo")  # bucket frame: ≤ ~2k rows, bounded
    cum = (
        j.withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .withColumn(
            "cum_old",
            F.expr(
                "(sum(n_old) OVER (ORDER BY bucket_lo"
                " ROWS UNBOUNDED PRECEDING) * 1000000L) div t_old"
            ),
        )
        .withColumn(
            "cum_new",
            F.expr(
                "(sum(n_new) OVER (ORDER BY bucket_lo"
                " ROWS UNBOUNDED PRECEDING) * 1000000L) div t_new"
            ),
        )
        .withColumn("next_lo", F.lead("bucket_lo").over(w))
    )
    return cum.groupBy("t_old", "t_new", "n_buckets").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("next_lo").isNotNull(),
                    F.abs(F.col("cum_old") - F.col("cum_new"))
                    * (F.col("next_lo") - F.col("bucket_lo")),
                )
            ),
            F.lit(0),
        ).cast("long").alias("emd_ppm_units")
    ).select(
        F.col("t_old").alias("n_old"),
        F.col("t_new").alias("n_new"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        "emd_ppm_units",
    )


def hdr_wasserstein_drift(
    old: DataFrame, new: DataFrame, value_col: str
) -> DataFrame:
    """:func:`hdr_wasserstein_from_hists` + the two histogram scans (the
    row-reading convenience entry, mirroring
    :func:`hdr_distribution_drift`)."""
    ho = old.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    hn = new.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_new")
    )
    return hdr_wasserstein_from_hists(ho, hn)


def hdr_wasserstein_drift_sql(
    old_cte: str, new_cte: str, value_expr: str
) -> str:
    """DuckDB rendering of :func:`hdr_wasserstein_drift` — identical
    bucketing, integer CDF ppm, and |cumdiff|·gap fold."""
    def hist(src: str) -> str:
        return f"""
  SELECT (v >> qs) << qs AS bucket_lo, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT CAST({value_expr} AS BIGINT) AS v,
           CAST(greatest(length(bin(CAST({value_expr} AS BIGINT)))
                         - {QH_SIG_BITS}, 0) AS INT) AS qs
    FROM {src}
  ) GROUP BY 1"""

    return f"""
WITH old_v AS ({old_cte}),
new_v AS ({new_cte}),
ho AS ({hist('old_v')}),
hn AS ({hist('new_v')}),
j AS (
  SELECT coalesce(ho.bucket_lo, hn.bucket_lo) AS bucket_lo,
         coalesce(ho.n, 0) AS n_old, coalesce(hn.n, 0) AS n_new
  FROM ho FULL OUTER JOIN hn ON ho.bucket_lo = hn.bucket_lo
),
t AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM j
),
cum AS (
  SELECT bucket_lo,
         (sum(n_old) OVER (ORDER BY bucket_lo ROWS UNBOUNDED PRECEDING)
          * 1000000) // t_old AS cum_old,
         (sum(n_new) OVER (ORDER BY bucket_lo ROWS UNBOUNDED PRECEDING)
          * 1000000) // t_new AS cum_new,
         lead(bucket_lo) OVER (ORDER BY bucket_lo) AS next_lo
  FROM j, t
)
SELECT t_old AS n_old, t_new AS n_new, n_buckets,
       CAST(coalesce(sum(CASE WHEN next_lo IS NOT NULL
                          THEN abs(cum_old - cum_new) * (next_lo - bucket_lo)
                          END), 0) AS BIGINT) AS emd_ppm_units
FROM cum, t
GROUP BY t_old, t_new, n_buckets
"""


def hdr_ks_from_hists(ho: DataFrame, hn: DataFrame) -> DataFrame:
    """Kolmogorov–Smirnov drift statistic from two PRE-BUILT HDR
    histograms, exact integers end-to-end::

        (n_old, n_new, n_buckets, ks_ppm)

    ``ks_ppm = max_i |CDF_old(i) − CDF_new(i)|`` over the bucket-sorted
    union, each CDF an exact ppm (``cumsum·10⁶ div total``). Completes
    the drift triptych: TVD (how much mass moved), W1 (how far it
    moved), KS (the single worst CDF gap — the classical two-sample test
    statistic, what a monitoring threshold α maps onto). Same rejection
    of PSI/KL stands: those need per-bucket ``ln`` (float territory); KS
    is a pure integer max.

    Scale: identical physiology to :func:`hdr_wasserstein_from_hists` —
    two ≤~2k-bucket frames, one full-outer join, one bounded window over
    the bucket frame, never row-scaled.
    """
    j = (
        ho.join(hn, "bucket_lo", "full_outer")
        .select(
            "bucket_lo",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .localCheckpoint(eager=False)  # totals + cumulative read it twice
    )
    tot = j.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.lit(1).alias("_k"),
    )
    cum = (
        j.withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .withColumn(
            "cum_old",
            F.expr(
                "(sum(n_old) OVER (ORDER BY bucket_lo"
                " ROWS UNBOUNDED PRECEDING) * 1000000L) div t_old"
            ),
        )
        .withColumn(
            "cum_new",
            F.expr(
                "(sum(n_new) OVER (ORDER BY bucket_lo"
                " ROWS UNBOUNDED PRECEDING) * 1000000L) div t_new"
            ),
        )
    )
    return cum.groupBy("t_old", "t_new", "n_buckets").agg(
        F.max(F.abs(F.col("cum_old") - F.col("cum_new")))
        .cast("long")
        .alias("ks_ppm")
    ).select(
        F.col("t_old").alias("n_old"),
        F.col("t_new").alias("n_new"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        "ks_ppm",
    )


def hdr_ks_drift(old: DataFrame, new: DataFrame, value_col: str) -> DataFrame:
    """:func:`hdr_ks_from_hists` + the two histogram scans (row-reading
    convenience entry, mirroring :func:`hdr_wasserstein_drift`)."""
    ho = old.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    hn = new.transform(hdr_histogram([], value_col)).select(
        "bucket_lo", F.col("n").alias("n_new")
    )
    return hdr_ks_from_hists(ho, hn)


def hdr_ks_drift_sql(old_cte: str, new_cte: str, value_expr: str) -> str:
    """DuckDB rendering of :func:`hdr_ks_drift` — identical bucketing,
    integer CDF ppm, max-|gap| fold."""
    def hist(src: str) -> str:
        return f"""
  SELECT (v >> qs) << qs AS bucket_lo, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT CAST({value_expr} AS BIGINT) AS v,
           CAST(greatest(length(bin(CAST({value_expr} AS BIGINT)))
                         - {QH_SIG_BITS}, 0) AS INT) AS qs
    FROM {src}
  ) GROUP BY 1"""

    return f"""
WITH old_v AS ({old_cte}),
new_v AS ({new_cte}),
ho AS ({hist('old_v')}),
hn AS ({hist('new_v')}),
j AS (
  SELECT coalesce(ho.bucket_lo, hn.bucket_lo) AS bucket_lo,
         coalesce(ho.n, 0) AS n_old, coalesce(hn.n, 0) AS n_new
  FROM ho FULL OUTER JOIN hn ON ho.bucket_lo = hn.bucket_lo
),
t AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM j
),
cum AS (
  SELECT bucket_lo,
         (sum(n_old) OVER (ORDER BY bucket_lo ROWS UNBOUNDED PRECEDING)
          * 1000000) // t_old AS cum_old,
         (sum(n_new) OVER (ORDER BY bucket_lo ROWS UNBOUNDED PRECEDING)
          * 1000000) // t_new AS cum_new
  FROM j, t
)
SELECT t_old AS n_old, t_new AS n_new, n_buckets,
       CAST(max(abs(cum_old - cum_new)) AS BIGINT) AS ks_ppm
FROM cum, t
GROUP BY t_old, t_new, n_buckets
"""


def countmin_join_size(
    left: DataFrame, right: DataFrame, key_col: str
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches — the
    AGMS/CM inner-product estimator ``|A ⋈ B| ≈ min_r Σ_c cntA(r,c)·
    cntB(r,c)``, next to the exact answer and its error::

        (exact_size, est_size, err_ppm)    -- one row

    The estimator never expands the join: each side folds to its
    DEPTH×WIDTH grid (map-side combinable), the sketch⋈sketch product
    touches ≤ DEPTH·WIDTH cells, and ``est ≥ exact`` by construction
    (hash collisions only add).  This is the planner-side primitive for
    sizing a shuffle BEFORE running it; the exact side here exists to
    grade the sketch (same eval pattern as ``hll_error_eval``).

    Exact side: per-key counts on each side (the same pre-aggregates a
    real pipeline already has), equi-joined on the key — Σ fA·fB, never
    a row-level join.
    """
    ca = countmin_counts(left, key_col)
    cb = countmin_counts(right, key_col)
    # A CM row whose cells never collide across the two sketches has
    # inner product 0 (absent cells count 0); left-join the products
    # against the full DEPTH-row frame so those rows still vote in the
    # min — with disjoint key sets est_size is 0, not NULL.
    prod = (
        ca.join(cb.withColumnRenamed("cnt", "_cb"), ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("_cb")).cast("long").alias("_ip"))
    )
    est = (
        ca.select("r")
        .distinct()
        .join(prod, "r", "left")
        .agg(
            F.coalesce(F.min(F.coalesce(F.col("_ip"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("est_size")
        )
    )
    fa = left.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_fa")
    )
    fb = right.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_fb")
    )
    exact = fa.join(fb, "_k").agg(
        F.coalesce(F.sum(F.col("_fa") * F.col("_fb")), F.lit(0))
        .cast("long")
        .alias("exact_size")
    )
    return (
        exact.join(F.broadcast(est))
        .withColumn(
            "err_ppm",
            F.expr(
                "CAST(CASE WHEN exact_size = 0 THEN 0"
                " ELSE (est_size - exact_size) * 1000000 div exact_size END"
                " AS BIGINT)"
            ),
        )
        .select("exact_size", "est_size", "err_ppm")
    )


def countmin_join_size_sql(
    left_expr: str, right_expr: str, key_expr: str
) -> str:
    """DuckDB rendering of :func:`countmin_join_size` — same seeded
    cells via :func:`countmin_col_sql`, same min-of-inner-products."""
    col = countmin_col_sql(key_expr)
    return f"""
WITH ca AS (
  SELECT r, {col} AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM {left_expr}, {CM_ROWS_SQL} GROUP BY 1, 2
),
cb AS (
  SELECT r, {col} AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM {right_expr}, {CM_ROWS_SQL} GROUP BY 1, 2
),
est AS (
  SELECT CAST(coalesce(min(coalesce(p.ip, 0)), 0) AS BIGINT) AS est_size
  FROM (SELECT DISTINCT r FROM ca) rf
  LEFT JOIN (
    SELECT ca.r, sum(ca.cnt * cb.cnt) AS ip
    FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c
    GROUP BY 1
  ) p ON p.r = rf.r
),
fa AS (
  SELECT {key_expr} AS k, CAST(count(*) AS BIGINT) AS f
  FROM {left_expr} GROUP BY 1
),
fb AS (
  SELECT {key_expr} AS k, CAST(count(*) AS BIGINT) AS f
  FROM {right_expr} GROUP BY 1
),
exact AS (
  SELECT CAST(coalesce(sum(fa.f * fb.f), 0) AS BIGINT) AS exact_size
  FROM fa JOIN fb USING (k)
)
SELECT exact_size, est_size,
       CAST(CASE WHEN exact_size = 0 THEN 0
            ELSE (est_size - exact_size) * 1000000 // exact_size END
            AS BIGINT) AS err_ppm
FROM exact, est
"""
