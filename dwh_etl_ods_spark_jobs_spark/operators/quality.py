"""One-pass data-quality expectation suite (Deequ-style constraint checks).

The reference pipeline validates loads implicitly (sentinel rewrites,
``Voided = 0`` gates, NOT-NULL source predicates — cf. the catalog in
``jobs/filters.py``); production warehouses make those assertions explicit
and auditable. This operator evaluates a declared set of expectations over
a table in ONE aggregation pass — every row predicate becomes a
conditional sum and every uniqueness constraint a distinct count inside
the same ``agg()`` — then unpivots the single result row into one audit
row per check.

Exactness discipline: metrics are parts-per-million computed with integer
arithmetic (``n_ok * 1_000_000 div n_rows``), so the audit rows hash-match
DuckDB bit-for-bit regardless of partitioning.

Scale: one map-side-combinable scan per table, O(checks) columns of agg
state; distinct counts ride the same shuffle (Spark plans multi-distinct
via Expand). Output is O(checks) rows — nothing returns to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "RowCheck",
    "UniqueCheck",
    "dq_expectations",
    "dq_expectations_sql",
    "dq_audit_from_counts",
    "streaming_dq_counts",
    "k_anonymity_census",
    "k_anonymity_census_sql",
    "quarantine_split",
    "quarantine_split_sql_reason",
    "json_field_audit",
    "json_field_audit_sql",
    "BENFORD_PPM",
    "benford_first_digit_audit",
    "benford_first_digit_audit_sql",
]

PPM = 1_000_000


@dataclass(frozen=True)
class RowCheck:
    """A per-row boolean expectation; metric = fraction of rows satisfying
    it (NULL predicate counts as failed, matching SQL CASE semantics).

    ``spark_pred`` is a zero-arg factory (catalogs of checks are declared
    at module import, before any SparkContext exists — Column construction
    needs a live JVM)."""

    name: str
    spark_pred: Callable[[], Column]
    sql_pred: str
    min_ppm: int = PPM  # pass iff metric_ppm >= min_ppm


@dataclass(frozen=True)
class UniqueCheck:
    """A key-uniqueness expectation; metric = distinct(key)/rows.

    NULL-bearing key tuples count as distinct key values on BOTH engines:
    Spark's bare ``count_distinct(a, b)`` skips any-NULL rows while
    DuckDB's ``count(DISTINCT (a, b))`` counts them (ADVICE r7), so both
    sides render as a STRUCT/ROW distinct — ``count_distinct(struct(...))``
    vs ``count(DISTINCT row(...))`` — whose tuple is never NULL and whose
    fields compare null-safely, with identical results (pinned by
    tests/test_quality.py). Native tuple hashing, no per-field md5 cost
    (the md5-sentinel form measured +0.85 s on the sf0.1 battery)."""

    name: str
    cols: tuple[str, ...] = field(default_factory=tuple)
    min_ppm: int = PPM


def _unique_key_spark(cols: tuple[str, ...]) -> Column:
    return F.struct(*[F.col(c) for c in cols])


def _unique_key_sql(cols: tuple[str, ...]) -> str:
    return "row(" + ", ".join(cols) + ")"


def _check_aggs(checks: list[RowCheck | UniqueCheck]) -> list[Column]:
    """The one-pass aggregate column set (row count + one counter per
    check)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for ck in checks:
        if isinstance(ck, RowCheck):
            aggs.append(
                F.sum(F.when(ck.spark_pred(), 1).otherwise(0)).alias(
                    f"__ok_{ck.name}"
                )
            )
        else:
            aggs.append(
                F.count_distinct(_unique_key_spark(ck.cols)).alias(
                    f"__ok_{ck.name}"
                )
            )
    return aggs


def dq_audit_from_counts(
    counts: DataFrame, table_name: str, checks: list[RowCheck | UniqueCheck]
) -> DataFrame:
    """Unpivot a one-row counter frame (``__n`` + ``__ok_<check>``) into
    the audit rows — shared by the batch path and streaming snapshots."""
    # n = 0 (empty/failed-upstream extract) must FAIL loudly, not emit NULL
    # audit rows that downstream passed-gating never sees (ADVICE r7):
    # metric_ppm -> 0, passed -> 0.
    audit_structs = [
        F.struct(
            F.lit(ck.name).alias("check_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__ok_{ck.name}").alias("n_ok"),
            F.expr(
                f"CASE WHEN __n = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE (__ok_{ck.name} * {PPM}L) div __n END"
            ).alias("metric_ppm"),
            F.expr(
                f"CASE WHEN __n = 0 THEN 0 ELSE "
                f"CAST((__ok_{ck.name} * {PPM}L) div __n >= {ck.min_ppm} AS INT) END"
            ).alias("passed"),
        )
        for ck in checks
    ]
    return counts.select(
        F.explode(F.array(*audit_structs)).alias("a")
    ).select(
        F.lit(table_name).alias("table_name"),
        F.col("a.check_name"),
        F.col("a.n_rows"),
        F.col("a.n_ok"),
        F.col("a.metric_ppm"),
        F.col("a.passed"),
    )


def dq_expectations(
    df: DataFrame, table_name: str, checks: list[RowCheck | UniqueCheck]
) -> DataFrame:
    """Audit rows ``(table_name, check_name, n_rows, n_ok, metric_ppm,
    passed)`` for every expectation, from one aggregation pass."""
    return dq_audit_from_counts(df.agg(*_check_aggs(checks)), table_name, checks)


def streaming_dq_counts(
    stream: DataFrame, checks: list[RowCheck]
) -> DataFrame:
    """Continuously-maintained expectation counters over a stream — live
    data-quality monitoring with O(checks) scalar state, no matter how
    many rows flow past. Run in update/complete mode; feed any snapshot to
    :func:`dq_audit_from_counts` — the counters are plain conditional
    sums, so a snapshot's audit rows are BIT-IDENTICAL to a batch
    :func:`dq_expectations` over the same rows (pytest-pinned), and
    micro-batch boundaries can never perturb a metric.

    RowChecks only: a uniqueness counter needs distinct state (unbounded),
    which streaming aggregation rightly refuses — dedupe upstream with
    ``dedupe_within_watermark`` and count instead.
    """
    bad = [ck.name for ck in checks if not isinstance(ck, RowCheck)]
    if bad:
        raise ValueError(
            f"streaming DQ supports RowChecks only (distinct-state checks "
            f"{bad} are unbounded); dedupe upstream within a watermark"
        )
    return stream.agg(*_check_aggs(checks))


def dq_expectations_sql_parts(
    table: str, checks: list[RowCheck | UniqueCheck]
) -> tuple[str, list[str]]:
    """DuckDB rendering, decomposed so several tables' suites compose into
    ONE statement: returns ``(cte_definition, per-check SELECTs)`` — the
    caller stitches ``WITH cte1, cte2 SELECT ... UNION ALL ...`` (a WITH
    block per table can't be unioned directly)."""
    aggs = ["count(*) AS n"]
    for ck in checks:
        if isinstance(ck, RowCheck):
            aggs.append(
                f"sum(CASE WHEN {ck.sql_pred} THEN 1 ELSE 0 END) AS ok_{ck.name}"
            )
        else:
            aggs.append(
                f"count(DISTINCT {_unique_key_sql(ck.cols)}) AS ok_{ck.name}"
            )
    cte = f"agg_{table} AS (SELECT {', '.join(aggs)} FROM {table})"
    rows = [
        f"""SELECT '{table}' AS table_name, '{ck.name}' AS check_name,
       CAST(n AS BIGINT) AS n_rows, CAST(ok_{ck.name} AS BIGINT) AS n_ok,
       CAST(CASE WHEN n = 0 THEN 0
                 ELSE (ok_{ck.name} * {PPM}) // n END AS BIGINT) AS metric_ppm,
       CAST(CASE WHEN n = 0 THEN 0
                 WHEN (ok_{ck.name} * {PPM}) // n >= {ck.min_ppm}
                 THEN 1 ELSE 0 END AS INT) AS passed
FROM agg_{table}"""
        for ck in checks
    ]
    return cte, rows


def dq_expectations_sql(
    suites: dict[str, list[RowCheck | UniqueCheck]]
) -> str:
    """One DuckDB statement auditing every (table -> checks) suite."""
    ctes, rows = [], []
    for table, checks in suites.items():
        cte, table_rows = dq_expectations_sql_parts(table, checks)
        ctes.append(cte)
        rows.extend(table_rows)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


def k_anonymity_census(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Privacy-risk audit: rows grouped by their quasi-identifier tuple
    form equivalence classes; any class smaller than ``k`` re-identifies
    its members (Sweeney, IJUFKS 2002 — k-anonymity). Returns the census
    by class size::

        (class_size, n_classes, n_rows, at_risk)

    with ``at_risk = 1`` where ``class_size < k``. Total at-risk rows /
    total rows gives the exposure ratio; the k-anonymity of the table is
    the smallest class_size present.

    Scale: ONE shuffle on the quasi-identifier tuple (map-side
    combinable count — NULLs group as values, matching SQL GROUP BY);
    the second aggregation runs on one row per class, and class-size
    grouping collapses that to at most a few hundred rows. No row data
    leaves the first aggregation.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            (F.col("class_size") < k).cast("int").alias("at_risk"),
        )
    )


def k_anonymity_census_sql(table: str, quasi_cols: list[str], k: int) -> str:
    """DuckDB rendering of :func:`k_anonymity_census` (same two grouped
    passes; counts cast back to BIGINT so pandas keeps them integral)."""
    qcols = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
  SELECT {qcols}, CAST(count(*) AS BIGINT) AS class_size
  FROM {table} GROUP BY {qcols}
)
SELECT class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(class_size * count(*) AS BIGINT) AS n_rows,
       CAST(class_size < {k} AS INT) AS at_risk
FROM classes GROUP BY class_size
"""


def quarantine_split(
    df: DataFrame, checks: list[RowCheck]
) -> tuple[DataFrame, DataFrame]:
    """Row-level expectation routing (the Delta-Live-Tables/Deequ
    "expect or quarantine" shape): returns ``(passed, quarantined)``
    where quarantined rows carry ``failed_checks`` — the comma-joined,
    declaration-ordered names of every expectation they violate (NULL
    predicate = violation, matching :func:`dq_expectations`).

    Scale: one scan-side projection computes every check flag once; the
    two outputs are opposite filters over it (shared subtree, zero
    shuffle). Write ``quarantined`` to a side table and the load keeps
    flowing — no crash, no silent row loss.
    """
    bad = [ck.name for ck in checks if not isinstance(ck, RowCheck)]
    if bad:
        raise ValueError(f"quarantine_split takes RowChecks only, got {bad}")
    reason = F.array_join(
        F.filter(
            F.array(
                *[
                    F.when(ck.spark_pred(), F.lit(None).cast("string"))
                    .otherwise(F.lit(ck.name))
                    for ck in checks
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    flagged = df.withColumn("failed_checks", reason)
    passed = flagged.filter(F.col("failed_checks") == "").drop("failed_checks")
    quarantined = flagged.filter(F.col("failed_checks") != "")
    return passed, quarantined


def quarantine_split_sql_reason(checks: list[RowCheck]) -> str:
    """DuckDB rendering of the ``failed_checks`` expression (same
    declaration order, same NULL-as-violation rule)."""
    arms = ", ".join(
        f"CASE WHEN ({ck.sql_pred}) THEN NULL ELSE '{ck.name}' END"
        for ck in checks
    )
    return (
        f"array_to_string(list_filter([{arms}], x -> x IS NOT NULL), ',')"
    )


# ---------------------------------------------------------------------------
# Embedded-JSON field audit (semi-structured column quality)
# ---------------------------------------------------------------------------

def json_field_audit(
    df: DataFrame,
    json_col: str,
    fields: list[tuple[str, str]],
    numeric_sums: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """One-row parse audit of an embedded JSON string column::

        (n_rows, n_valid, n_malformed, nn_<field>..., sum_<name>...)

    ``fields`` is ``(name, json_path)`` — ``nn_<name>`` counts rows where
    the path yields a value; ``numeric_sums`` additionally sums a path's
    integer values over valid rows (salvage proof). Validity is
    ``get_json_object(col, '$')`` — NULL iff the cell is not parseable
    JSON, the portable equivalent of DuckDB's ``json_valid`` (rendered by
    :func:`json_field_audit_sql`). Malformed rows never kill the job and
    never silently vanish: they are COUNTED, and the caller quarantines
    with the same predicate. Scale: scan-side expressions folded into one
    map-side-combinable aggregation — no shuffle of row data.
    """
    j = F.col(json_col)
    valid = F.get_json_object(j, "$").isNotNull()
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).cast("long").alias("n_malformed"),
    ]
    for name, path in fields:
        aggs.append(
            F.sum(
                F.when(F.get_json_object(j, path).isNotNull(), 1).otherwise(0)
            ).cast("long").alias(f"nn_{name}")
        )
    for name, path in numeric_sums or []:
        aggs.append(
            F.coalesce(
                F.sum(F.get_json_object(j, path).cast("long")), F.lit(0)
            ).cast("long").alias(f"sum_{name}")
        )
    return df.agg(*aggs)


def json_field_audit_sql(
    table_expr: str,
    json_expr: str,
    fields: list[tuple[str, str]],
    numeric_sums: list[tuple[str, str]] | None = None,
) -> str:
    """DuckDB rendering of :func:`json_field_audit` (json_valid guard —
    DuckDB's json_extract ERRORS on invalid JSON instead of yielding
    NULL, so every path access is gated)."""
    j = json_expr
    sel = [
        "CAST(count(*) AS BIGINT) AS n_rows",
        f"CAST(sum(CASE WHEN json_valid({j}) THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_valid",
        f"CAST(sum(CASE WHEN json_valid({j}) THEN 0 ELSE 1 END) AS BIGINT)"
        " AS n_malformed",
    ]
    for name, path in fields:
        sel.append(
            f"CAST(sum(CASE WHEN json_valid({j}) AND "
            f"json_extract_string({j}, '{path}') IS NOT NULL "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS nn_{name}"
        )
    for name, path in numeric_sums or []:
        sel.append(
            f"CAST(coalesce(sum(CASE WHEN json_valid({j}) THEN "
            f"CAST(json_extract_string({j}, '{path}') AS BIGINT) END), 0) "
            f"AS BIGINT) AS sum_{name}"
        )
    return f"SELECT {', '.join(sel)} FROM {table_expr}"


# ---------------------------------------------------------------------------
# Benford first-digit audit (synthetic / fabricated-data detector)
# ---------------------------------------------------------------------------

# floor(log10(1 + 1/d) * 1e6): CONSTANT integer expectations — both engines
# consume the same literals, so no runtime float ever enters the compare.
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_first_digit_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit census of a positive numeric column against
    Benford's law (Newcomb 1881 / Benford 1938 — the classic
    fabricated-or-synthetic-data tripwire for naturally-spanning
    magnitudes like amounts)::

        (digit, n, share_ppm, benford_ppm, dev_ppm)

    ``share_ppm`` is the exact observed ppm among positive values;
    ``benford_ppm`` the constant integer expectation; ``dev_ppm`` their
    absolute gap. Rows with value <= 0 or NULL are excluded (Benford is
    defined on positive magnitudes). Scale: one map-side-combinable
    9-ary count + a broadcast of the one-row total.
    """
    v = F.col(value_col).cast("decimal(38,0)")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # total + shares read it twice
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    tot = counts.agg(F.sum("n").cast("long").alias("_t")).withColumn("_one", one)
    bppm = F.element_at(
        F.array(*[F.lit(BENFORD_PPM[d]) for d in range(1, 10)]), F.col("digit")
    )
    return (
        counts.withColumn("_one", one)
        .join(F.broadcast(tot), "_one")
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000L) div _t").alias("share_ppm"),
            bppm.cast("long").alias("benford_ppm"),
            F.abs(
                F.expr("(n * 1000000L) div _t") - bppm.cast("long")
            ).alias("dev_ppm"),
        )
    )


def benford_first_digit_audit_sql(table_expr: str, value_expr: str) -> str:
    """DuckDB rendering of :func:`benford_first_digit_audit` (same
    constants, same integer shares)."""
    arms = " ".join(
        f"WHEN {d} THEN {BENFORD_PPM[d]}" for d in range(1, 10)
    )
    return f"""
WITH counts AS (
  SELECT CAST(substring(CAST(CAST({value_expr} AS HUGEINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM {table_expr}
  WHERE {value_expr} IS NOT NULL AND {value_expr} > 0
  GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM counts)
SELECT digit, n,
       (n * 1000000) // tt AS share_ppm,
       CAST(CASE digit {arms} END AS BIGINT) AS benford_ppm,
       abs((n * 1000000) // tt - CAST(CASE digit {arms} END AS BIGINT))
         AS dev_ppm
FROM counts, t
"""


def l_diversity_census(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l_min: int
) -> DataFrame:
    """Privacy-risk audit one level past k-anonymity: a quasi-identifier
    class can be large (k-anonymous) yet expose everyone if all its
    members share ONE sensitive value — l-diversity (Machanavajjhala et
    al., ICDE 2006) requires ≥ ``l_min`` DISTINCT sensitive values per
    class. Census by observed diversity::

        (diversity, n_classes, n_rows, at_risk)

    ``diversity`` = distinct non-NULL sensitive values in the class
    (0 = all-NULL — maximally exposed); ``at_risk = 1`` where
    ``diversity < l_min``. Complements :func:`k_anonymity_census` (same
    census shape, different axis).

    Scale: ONE shuffle on the quasi-identifier tuple (count +
    count-distinct in the same aggregation — Spark plans distinct aggs as
    a two-phase expand without an extra job); the diversity census then
    runs on one row per class. No row data leaves the first aggregation.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("diversity"),
    )
    return (
        classes.groupBy("diversity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
        )
        .select(
            F.col("diversity").cast("long").alias("diversity"),
            "n_classes",
            "n_rows",
            (F.col("diversity") < l_min).cast("int").alias("at_risk"),
        )
    )


def l_diversity_census_sql(
    table: str, quasi_cols: list[str], sensitive_expr: str, l_min: int
) -> str:
    """DuckDB rendering of :func:`l_diversity_census` (same two grouped
    passes; COUNT(DISTINCT x) ignores NULL in both engines)."""
    qcols = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
  SELECT {qcols},
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT {sensitive_expr}) AS BIGINT) AS diversity
  FROM {table} GROUP BY {qcols}
)
SELECT diversity,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(diversity < {l_min} AS INT) AS at_risk
FROM classes GROUP BY diversity
"""


def fd_violations(
    df: DataFrame, fds: list[tuple[list[str], str]]
) -> DataFrame:
    """Functional-dependency violation census: for each candidate FD
    ``LHS → rhs``, how badly the data breaks it::

        (fd, n_groups, n_violating_groups, n_violating_rows, max_distinct_rhs)

    A group (distinct LHS value) VIOLATES when it maps to >1 distinct
    rhs (NULL counts as a value — two rows (a, NULL) and (a, 1) violate,
    the data-profiling convention). The discovery primitive behind key
    inference, denormalization checks, and "is this column derivable"
    questions a catalog migration asks of every table.

    Scale: one groupBy per FD — LHS-keyed count-distinct aggregations,
    map-side combinable; the per-FD results union into a ≤len(fds)-row
    frame. Candidate FDs are a declared list (the pairwise-all-columns
    search is a different, quadratic tool).
    """
    outs = []
    for lhs, rhs in fds:
        name = ",".join(lhs) + "->" + rhs
        g = (
            df.groupBy(*[F.col(c) for c in lhs])
            .agg(
                F.count(F.lit(1)).cast("long").alias("_n"),
                F.size(F.collect_set(F.coalesce(F.col(rhs).cast("string"), F.lit("\x00NULL"))))
                .cast("long")
                .alias("_d"),
            )
        )
        outs.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("_d") > 1).cast("long")).cast("long").alias(
                    "n_violating_groups"
                ),
                F.sum(F.when(F.col("_d") > 1, F.col("_n")).otherwise(F.lit(0)))
                .cast("long")
                .alias("n_violating_rows"),
                F.max("_d").cast("long").alias("max_distinct_rhs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fd_violations_sql(
    table_expr: str, fds: list[tuple[list[str], str]]
) -> str:
    """DuckDB rendering of :func:`fd_violations` (same NULL-as-value
    convention via the same sentinel coalesce)."""
    parts = []
    for lhs, rhs in fds:
        name = ",".join(lhs) + "->" + rhs
        k = ", ".join(lhs)
        parts.append(f"""
SELECT '{name}' AS fd,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN _d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN _d > 1 THEN _n ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       CAST(max(_d) AS BIGINT) AS max_distinct_rhs
FROM (
  SELECT CAST(count(*) AS BIGINT) AS _n,
         CAST(count(DISTINCT coalesce(CAST({rhs} AS VARCHAR), chr(1) || 'NULL'))
              AS BIGINT) AS _d
  FROM {table_expr} GROUP BY {k}
)""")
    return "\nUNION ALL\n".join(parts)


def t_closeness_census(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_max_ppm: int,
) -> DataFrame:
    """Privacy-risk audit one level past l-diversity: a class can hold
    many distinct sensitive values (l-diverse) yet still leak if its
    sensitive DISTRIBUTION differs sharply from the table's —
    t-closeness (Li et al., ICDE 2007) bounds the Earth-Mover's
    Distance between each quasi-identifier class's sensitive
    distribution and the global one. Census by EMD decile::

        (emd_decile, n_classes, n_rows, n_at_risk)

    ``sensitive_col`` must be an ORDERED INTEGER ordinal over a BOUNDED
    domain (banded salary, severity grade, priority rank — the caller
    owns the banding; the bounded-domain contract is ``acf_lags``-style
    and is what makes the value grid a broadcastable frame). For the
    ordered EMD over V distinct values with unit adjacent-step ground
    distance normalized by the diameter::

        EMD = (1/(V-1)) · Σ_{i=1..V-1} |cumP_i − cumQ_i|

    computed EXACTLY in integers as ``Σ |cumC_i·N − cumG_i·n|`` (class
    cum-count × table total vs global cum-count × class size,
    decimal(38,0) products), with ONE final IEEE division by
    ``n·N·(V−1)`` rounded to ppm. ``emd_decile = emd_ppm div 100000``;
    ``n_at_risk`` counts classes with ``emd_ppm > t_max_ppm``. V = 1
    (single global sensitive value) → EMD exactly 0 on both engines.
    NULL sensitive rows are excluded (the l-diversity convention).

    Scale: one (quasi, value) count pass + one V-row global value frame
    joined onto the class grid by CONSTANT-KEY BROADCAST (the Markov
    scenario-grid pattern — a hash join on a literal key, never a
    nested-loop), then per-class windows over the bounded V-row frame.
    Output is a ≤11-row census.
    """
    sens = F.col(sensitive_col).cast("long")
    rows = df.where(sens.isNotNull()).select(
        *[F.col(c) for c in quasi_cols], sens.alias("_v")
    )
    cell = rows.groupBy(*quasi_cols, "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    vw = Window.orderBy("_v")  # bounded V-row frame (global value grid)
    values = (
        rows.groupBy("_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_g"))
        .withColumn("_cum_g", F.sum("_g").over(
            vw.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"))
        .withColumn("_rn", F.row_number().over(vw).cast("long"))
        .withColumn("_one", one)
    )
    n_total = values.groupBy("_one").agg(
        F.sum("_g").cast("long").alias("_nn"),
        F.count(F.lit(1)).cast("long").alias("_vv"),
    )
    values = values.join(F.broadcast(n_total), "_one")
    classes = cell.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("_n")
    ).withColumn("_one", one)
    # dense (class x value) grid: constant-key BROADCAST HASH join of the
    # bounded V-row value frame onto the class frame, then the sparse
    # class-value counts fill in by left join
    grid = (
        classes.join(F.broadcast(values.select(
            "_one", "_v", "_cum_g", "_rn", "_nn", "_vv"
        )), "_one")
        .join(cell, [*quasi_cols, "_v"], "left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)).cast("long"))
    )
    cw = Window.partitionBy(*quasi_cols).orderBy("_v")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum_c = F.sum("_c").over(
        cw.rowsBetween(Window.unboundedPreceding, 0)
    ).cast("long")
    term = F.when(
        F.col("_rn") < F.col("_vv"),
        F.abs(dec(cum_c) * dec(F.col("_nn")) - dec(F.col("_cum_g")) * dec(F.col("_n"))),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    per_class = (
        grid.withColumn("_term", term)
        .groupBy(*quasi_cols)
        .agg(
            F.max("_n").alias("_n"),
            F.max("_nn").alias("_nn"),
            F.max("_vv").alias("_vv"),
            F.sum("_term").alias("_num"),
        )
        .select(
            F.col("_n"),
            F.when(F.col("_vv") > 1,
                F.round(
                    F.col("_num").cast("double")
                    / (
                        F.col("_n").cast("double")
                        * F.col("_nn").cast("double")
                        * (F.col("_vv") - F.lit(1)).cast("double")
                    )
                    * F.lit(1000000.0)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")).alias("_emd_ppm"),
        )
    )
    return (
        per_class.groupBy(
            (F.col("_emd_ppm") / F.lit(100000)).cast("long").alias("emd_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum((F.col("_emd_ppm") > t_max_ppm).cast("long"))
            .cast("long")
            .alias("n_at_risk"),
        )
    )


def t_closeness_census_sql(
    table: str, quasi_cols: list[str], sensitive_expr: str, t_max_ppm: int
) -> str:
    """DuckDB rendering of :func:`t_closeness_census` — same exact
    integer prefix products (HUGEINT), same single rounded division."""
    q = ", ".join(quasi_cols)
    qc = ", ".join(f"c.{c}" for c in quasi_cols)
    return f"""
WITH rows_f AS (
  SELECT {q}, CAST({sensitive_expr} AS BIGINT) AS v
  FROM {table} WHERE {sensitive_expr} IS NOT NULL
),
cell AS (
  SELECT {q}, v, CAST(count(*) AS BIGINT) AS c
  FROM rows_f GROUP BY {q}, v
),
vals AS (
  SELECT v, CAST(count(*) AS BIGINT) AS g,
         CAST(sum(count(*)) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_g,
         CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn
  FROM rows_f GROUP BY v
),
tot AS (
  SELECT CAST(sum(g) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS vv
  FROM vals
),
classes AS (
  SELECT {q}, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY {q}
),
grid AS (
  SELECT g.*, coalesce(ce.c, 0) AS c
  FROM (SELECT {qc}, c.n, va.v, va.cum_g, va.rn, t.nn, t.vv
        FROM classes c, vals va, tot t) g
  LEFT JOIN cell ce ON {" AND ".join(f"ce.{x} = g.{x}" for x in quasi_cols)}
                    AND ce.v = g.v
),
cumed AS (
  SELECT *, CAST(sum(c) OVER (PARTITION BY {q} ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS HUGEINT) AS cum_c
  FROM grid
),
per_class AS (
  SELECT {q}, max(n) AS n, max(nn) AS nn, max(vv) AS vv,
         sum(CASE WHEN rn < vv THEN
               abs(cum_c * nn - CAST(cum_g AS HUGEINT) * n)
             ELSE 0 END) AS num
  FROM cumed GROUP BY {q}
),
scored AS (
  SELECT n,
         CASE WHEN vv > 1 THEN
           CAST(round(CAST(num AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
                         * CAST(vv - 1 AS DOUBLE))
                      * 1000000.0) AS BIGINT)
         ELSE 0 END AS emd_ppm
  FROM per_class
)
SELECT CAST(emd_ppm // 100000 AS BIGINT) AS emd_decile,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN emd_ppm > {t_max_ppm} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_risk
FROM scored GROUP BY 1
"""
