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


def apply_rules(rules: Sequence[CleaningRule]) -> CleaningRule:
    """Compose cleaning rules left-to-right into one transform."""

    def _apply(df: DataFrame) -> DataFrame:
        for rule in rules:
            df = rule(df)
        return df

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
    def _apply(df: DataFrame) -> DataFrame:
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
        c = F.col(col).try_cast("date")
        bad = F.lit(False)
        if lo_lit is not None:
            bad = bad | (c < lo_lit)
        if hi_lit is not None:
            bad = bad | (c > hi_lit)
        return df.withColumn(col, F.when(c.isNotNull() & bad, sent).otherwise(c))

    _apply.columns = (col,)  # type: ignore[attr-defined]  # introspection for generic tests
    _apply.kind = "date"  # type: ignore[attr-defined]
    return _apply


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

    def _apply(df: DataFrame) -> DataFrame:
        sent = (
            F.lit(sentinel).cast(cast_to) if sentinel is not None else F.lit(None).cast(cast_to)
        )
        # try_cast delivers the docstring's promised try-cast semantics under
        # ANSI mode too (plain cast of 'abc' to float would kill the job).
        c = F.col(col).try_cast(cast_to)
        bad = F.lit(False)
        if lo is not None:
            bad = bad | ((c <= lo) if bad_at_lo else (c < lo))
        if hi is not None:
            bad = bad | (c > hi)
        return df.withColumn(
            col, F.when(c.isNotNull() & bad, sent).otherwise(c)
        )

    _apply.columns = (col,)  # type: ignore[attr-defined]
    _apply.kind = "numeric"  # type: ignore[attr-defined]
    return _apply


def empty_to_null(cols: Sequence[str], trim: bool = False) -> CleaningRule:
    """'' (optionally after trim) -> NULL, per column."""

    def _apply(df: DataFrame) -> DataFrame:
        for col in cols:
            c = F.trim(F.col(col)) if trim else F.col(col)
            df = df.withColumn(col, F.when(c == "", F.lit(None)).otherwise(F.col(col)))
        return df

    _apply.columns = tuple(cols)  # type: ignore[attr-defined]
    _apply.kind = "string"  # type: ignore[attr-defined]
    return _apply


def values_to_null(col: str, values: Sequence[str]) -> CleaningRule:
    """Listed literal values -> NULL, everything else kept.

    The reference's ``when(col == 'N/A', null).otherwise(col)`` arms
    (``LoadPartnerNotificationServices.java:69-70``) — :func:`empty_to_null`
    generalized to arbitrary placeholder literals.
    """

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            col,
            F.when(F.col(col).isin(*list(values)), F.lit(None)).otherwise(F.col(col)),
        )

    _apply.columns = (col,)  # type: ignore[attr-defined]
    _apply.kind = "string"  # type: ignore[attr-defined]
    return _apply


def presence_flag(col: str, negative: str = "No", positive: str = "Yes") -> CleaningRule:
    """``negative`` stays, any other non-null value collapses to
    ``positive``, NULL stays NULL.

    Reproduces the reference's PatientDisabled ternary
    (``LoadHtsClients.java:90-92``): ``when(col == 'No', 'No')
    .when(col.isNotNull() & col != 'No', 'Yes').otherwise(null)``.
    """

    def _apply(df: DataFrame) -> DataFrame:
        c = F.col(col)
        return df.withColumn(
            col,
            F.when(c == negative, F.lit(negative))
            .when(c.isNotNull() & (c != negative), F.lit(positive))
            .otherwise(F.lit(None)),
        )

    _apply.columns = (col,)  # type: ignore[attr-defined]
    _apply.kind = "string"  # type: ignore[attr-defined]
    return _apply


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

    def _apply(df: DataFrame) -> DataFrame:
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
        if not mapping:
            raise ValueError("value_map requires at least one mapping entry")
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
            F.upper(F.col(col)) if case_insensitive else F.col(col),
        )
        if default is not None:
            expr = F.coalesce(looked, F.lit(default))
        elif otherwise_keep:
            expr = F.coalesce(looked, F.col(col))
        else:
            expr = looked
        return df.withColumn(col, expr)

    _apply.columns = (col,)  # type: ignore[attr-defined]
    _apply.kind = "string"  # type: ignore[attr-defined]
    return _apply


@dataclass(frozen=True)
class NullDefault:
    """``coalesce(col, default)`` — reference ``LoadHtsClientTests.sql:9,17-22``."""

    col: str
    default: object

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.col, F.coalesce(F.col(self.col), F.lit(self.default)))
