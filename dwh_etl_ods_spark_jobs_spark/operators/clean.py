"""Rule-based cleaning operators.

The reference's workhorse pattern is ``withColumn(c, when(p, v).otherwise(col(c)))``
instantiated hundreds of times (277 withColumn / 290 when across the Java
mains — SURVEY.md §2.2). Here the rule *types* are data:

- ``date_clamp``      -- clamp dates outside [lo, hi] to a sentinel date or
                         NULL (reference ``LoadARTPatients.java:94-120``,
                         ``LoadPatientVisits.java:103-105``,
                         ``LoadHtsEligibility.java:97-100``)
- ``range_sentinel``  -- numeric out-of-range -> sentinel (999)
                         (``LoadARTPatients.java:127-137``,
                         ``LoadPatientVisits.java:78-85``)
- ``empty_to_null``   -- '' -> NULL (``LoadHtsEligibility.java:83-97``)
- ``value_map``       -- hard-coded isin(...) -> canonical label
                         (``LoadHtsClientTests.java:81-112``,
                         ``LoadPrepPatient.java:103-114``)

All rules compile to Catalyst CASE expressions — fully codegen'd, no UDFs,
no shuffle. A chain of N rules over M columns is a single Project node.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CleaningRule = Callable[[DataFrame], DataFrame]


def _expr_rule(kind: str, col_exprs: Mapping[str, Callable[[Column], Column]]) -> CleaningRule:
    """Package per-column expression builders as a CleaningRule.

    ``col_exprs`` maps column name -> a builder taking the column's CURRENT
    expression and returning the cleaned one. Builders are lazy (no Column
    is constructed until a DataFrame arrives) so rule catalogs can still be
    declared at module import time, before any SparkSession exists. The
    ``col_exprs`` attribute is what lets :func:`apply_rules` fuse a chain of
    rules into one projection; applying the rule directly is a single
    ``withColumns`` — identical semantics to the former per-column
    ``withColumn`` loop (every rule here reads only the column it writes).
    """

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumns({c: fn(F.col(c)) for c, fn in col_exprs.items()})

    _apply.columns = tuple(col_exprs)  # type: ignore[attr-defined]  # introspection for generic tests
    _apply.kind = kind  # type: ignore[attr-defined]
    _apply.col_exprs = dict(col_exprs)  # type: ignore[attr-defined]
    return _apply


def apply_rules(rules: Sequence[CleaningRule]) -> CleaningRule:
    """Compose cleaning rules left-to-right into one transform.

    r15 optimization: maximal runs of expression rules (anything exposing
    ``col_exprs`` — every factory in this module) FUSE into one
    ``withColumns`` projection. ``DataFrame.withColumn`` re-analyzes the
    whole plan per call, so a catalog chain of N rules paid N analysis
    passes (O(N²) planner work — the dominant cost of the rule-heavy jobs;
    execution of the fused CASE expressions is unchanged). Same-column
    rules compose by substitution: rule k+1's input expression IS rule k's
    output expression, exactly the value the sequential form computed.
    Rules without ``col_exprs`` (joins, custom callables) flush the pending
    batch and apply in order, so relative ordering is preserved.
    """

    def _apply(df: DataFrame) -> DataFrame:
        pending: dict[str, Callable[[Column], Column]] = {}

        def flush(d: DataFrame) -> DataFrame:
            if pending:
                d = d.withColumns({c: fn(F.col(c)) for c, fn in pending.items()})
                pending.clear()
            return d

        for rule in rules:
            exprs = getattr(rule, "col_exprs", None)
            if exprs is None:
                df = flush(df)
                df = rule(df)
            else:
                for c, fn in exprs.items():
                    prev = pending.get(c)
                    if prev is None:
                        pending[c] = fn
                    else:
                        pending[c] = lambda col, f=fn, p=prev: f(p(col))
        return flush(df)

    return _apply


def _as_date_lit(d: dt.date | str | Column | None) -> Column | None:
    if d is None:
        return None
    if isinstance(d, Column):
        return d
    return F.to_date(F.lit(str(d)))


def date_clamp(
    col: str,
    lo: dt.date | str | None = None,
    hi: dt.date | str | Column | None = None,
    sentinel: dt.date | str | None = "1900-01-01",
    hi_is_current_date: bool = False,
    hi_offset_years: int = 0,
) -> CleaningRule:
    """Out-of-range dates -> ``sentinel`` (or NULL when sentinel is None).

    ``hi_is_current_date`` reproduces the reference's ``> current_date``
    upper bound; ``hi_offset_years=1`` reproduces the appointment-date
    variant (today + 1 year, ``LoadPatientVisits.java:103-105``).
    """
    def _expr(col_in: Column) -> Column:
        # Columns are built lazily so rule catalogs can be declared at module
        # import time, before any SparkSession exists.
        lo_lit = _as_date_lit(lo)
        if hi_is_current_date:
            hi_lit: Column | None = F.current_date()
        else:
            hi_lit = _as_date_lit(hi)
        if hi_offset_years:
            if hi_lit is None:
                raise ValueError(
                    "date_clamp: hi_offset_years needs an upper bound "
                    "(hi or hi_is_current_date)"
                )
            hi_lit = F.add_months(hi_lit, 12 * hi_offset_years)
        sent = _as_date_lit(sentinel) if sentinel is not None else F.lit(None).cast("date")
        # try_cast: the reference ran non-ANSI Spark where a malformed string
        # date cast to NULL; under ANSI (Spark 4 default) a plain cast would
        # crash the job on exactly the dirty values this rule exists to clean.
        c = col_in.try_cast("date")
        bad = F.lit(False)
        if lo_lit is not None:
            bad = bad | (c < lo_lit)
        if hi_lit is not None:
            bad = bad | (c > hi_lit)
        return F.when(c.isNotNull() & bad, sent).otherwise(c)

    if isinstance(hi, Column):
        # A Column upper bound may reference ANOTHER column, which must see
        # the row as produced by earlier rules — opt out of fusion so the
        # sequential projection order is preserved.
        def _apply(df: DataFrame) -> DataFrame:
            return df.withColumn(col, _expr(F.col(col)))

        _apply.columns = (col,)  # type: ignore[attr-defined]
        _apply.kind = "date"  # type: ignore[attr-defined]
        return _apply
    return _expr_rule("date", {col: _expr})


def range_sentinel(
    col: str,
    lo: float | None,
    hi: float | None,
    sentinel: float | None = 999.0,
    cast_to: str = "float",
    bad_at_lo: bool = False,
) -> CleaningRule:
    """Numeric (possibly string-typed) out-of-[lo,hi] -> sentinel.

    ``lo``/``hi`` may each be None for one-sided bounds (the reference's
    ``Duration < 0 -> 999`` has no upper bound, ``LoadARTPatients.java:128``;
    ``MonthsSinceLastTest > 1540 -> NULL`` has no lower bound,
    ``LoadHtsClientTests.java:111-112``). ``bad_at_lo=True`` makes the lower
    bound itself out-of-range (the reference's ``PeriodTaken <= 0 -> 999``
    uses ``leq``, ``LoadPatientPharmacy.java:95``). Non-numeric strings
    become NULL via try-cast semantics, matching the reference's
    cast-then-compare behavior on varchar vitals columns.
    """
    if lo is None and hi is None:
        raise ValueError("range_sentinel needs at least one bound")
    if bad_at_lo and lo is None:
        raise ValueError("range_sentinel: bad_at_lo needs a lower bound")

    def _expr(col_in: Column) -> Column:
        sent = (
            F.lit(sentinel).cast(cast_to) if sentinel is not None else F.lit(None).cast(cast_to)
        )
        # try_cast delivers the docstring's promised try-cast semantics under
        # ANSI mode too (plain cast of 'abc' to float would kill the job).
        c = col_in.try_cast(cast_to)
        bad = F.lit(False)
        if lo is not None:
            bad = bad | ((c <= lo) if bad_at_lo else (c < lo))
        if hi is not None:
            bad = bad | (c > hi)
        return F.when(c.isNotNull() & bad, sent).otherwise(c)

    return _expr_rule("numeric", {col: _expr})


def empty_to_null(cols: Sequence[str], trim: bool = False) -> CleaningRule:
    """'' (optionally after trim) -> NULL, per column."""

    def _expr(col_in: Column) -> Column:
        c = F.trim(col_in) if trim else col_in
        return F.when(c == "", F.lit(None)).otherwise(col_in)

    return _expr_rule("string", {col: _expr for col in cols})


def values_to_null(col: str, values: Sequence[str]) -> CleaningRule:
    """Listed literal values -> NULL, everything else kept.

    The reference's ``when(col == 'N/A', null).otherwise(col)`` arms
    (``LoadPartnerNotificationServices.java:69-70``) — :func:`empty_to_null`
    generalized to arbitrary placeholder literals.
    """

    def _expr(col_in: Column) -> Column:
        return F.when(col_in.isin(*list(values)), F.lit(None)).otherwise(col_in)

    return _expr_rule("string", {col: _expr})


def presence_flag(col: str, negative: str = "No", positive: str = "Yes") -> CleaningRule:
    """``negative`` stays, any other non-null value collapses to
    ``positive``, NULL stays NULL.

    Reproduces the reference's PatientDisabled ternary
    (``LoadHtsClients.java:90-92``): ``when(col == 'No', 'No')
    .when(col.isNotNull() & col != 'No', 'Yes').otherwise(null)``.
    """

    def _expr(c: Column) -> Column:
        return (
            F.when(c == negative, F.lit(negative))
            .when(c.isNotNull() & (c != negative), F.lit(positive))
            .otherwise(F.lit(None))
        )

    return _expr_rule("string", {col: _expr})


def value_map(
    col: str,
    mapping: Mapping[str, Sequence[str]],
    otherwise_keep: bool = True,
    case_insensitive: bool = False,
    default: str | None = None,
) -> CleaningRule:
    """Canonicalize values: each target label claims a list of source values.

    ``case_insensitive=True`` reproduces SQL Server's default collation
    (the reference compares under CI collation; Spark ``=`` is CS — SURVEY §4).
    The cleaning chains in the reference's Java mains run in Spark and are
    case-SENSITIVE — those maps use the default ``case_insensitive=False``.

    ``default`` sets a literal fallback for unmatched values (NULL inputs
    included), reproducing e.g. ``TbScreening -> otherwise("Not Done")``
    (``LoadHtsClientTests.java:85-89``); it overrides ``otherwise_keep``.
    """

    if not mapping:
        raise ValueError("value_map requires at least one mapping entry")

    def _expr(col_in: Column) -> Column:
        # r14: ONE map-literal lookup instead of a chained CASE WHEN ..
        # isin(..) per target. Semantics are identical — source→target
        # with FIRST-match-wins on a source claimed by two targets
        # (mapping iteration order, exactly the old WHEN order), NULL /
        # unmapped falls through to the default/keep branch (element_at
        # on a missing or NULL key is NULL, coalesce handles the rest).
        # Why: the catalog wires dozens of these per job; the CASE form
        # built a WHEN-chain expression tree that cost more to ANALYZE
        # AND OPTIMIZE per run than to execute (job_rules_canonicalization
        # construction 4.25 s vs 0.2 s execution at sf0.1), and evaluated
        # every branch's isin scan per row. The map literal is one
        # expression node and one lookup.
        kv: dict[str, str] = {}
        for target, sources in mapping.items():
            for s in sources:
                if s is None:
                    continue  # NULL never matched the old isin either
                k = s.upper() if case_insensitive else s
                if k not in kv:
                    kv[k] = target
        pairs: list[Column] = []
        for k, v in kv.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
        looked = F.element_at(
            F.create_map(*pairs),
            F.upper(col_in) if case_insensitive else col_in,
        )
        if default is not None:
            return F.coalesce(looked, F.lit(default))
        if otherwise_keep:
            return F.coalesce(looked, col_in)
        return looked

    return _expr_rule("string", {col: _expr})


@dataclass(frozen=True)
class NullDefault:
    """``coalesce(col, default)`` — reference ``LoadHtsClientTests.sql:9,17-22``."""

    col: str
    default: object

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.col, F.coalesce(F.col(self.col), F.lit(self.default)))

    @property
    def col_exprs(self) -> dict[str, Callable[[Column], Column]]:
        return {self.col: lambda c: F.coalesce(c, F.lit(self.default))}
