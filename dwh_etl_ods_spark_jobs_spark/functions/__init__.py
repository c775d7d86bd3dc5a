"""T-SQL-compatible scalar function shims (SURVEY.md §2.8).

The reference's pushed-down queries rely on SQL Server semantics that differ
subtly from Spark's; these shims encode the *exact* T-SQL behavior so query
translations stay faithful:

- ``datediff_yy``   -- T-SQL DATEDIFF(yy) counts year-BOUNDARY crossings,
                       not full years (``LoadHistoricalARTOutcomes.sql:75``)
- ``datediff_dd``   -- boundary-crossing day diff == Spark datediff
- ``eomonth``       -- EOMONTH -> last_day
- ``convert_103``   -- CONVERT(datetime, s, 103): dd/MM/yyyy
                       (``CleanTestKits.sql:10``)
- ``try_cast_timestamp`` -- TRY_CAST(s AS datetime): NULL on failure
                       (``CleanTestKits.sql:4,30``)
- ``hashbytes_sha2_256`` -- HASHBYTES + convert(...,2) uppercase hex
                       (``DatabaseUtils.java:61``)
- ``isnull``        -- 2-arg coalesce
- ``datefromparts`` -- make_date
- ``dateadd_*``     -- add_months / date_add / +interval seconds
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def datediff_yy(start: Column, end: Column) -> Column:
    """T-SQL ``DATEDIFF(yy, start, end)``: year(end) - year(start)."""
    return (F.year(end) - F.year(start)).cast("int")


def datediff_dd(start: Column, end: Column) -> Column:
    """T-SQL ``DATEDIFF(dd, start, end)`` == Spark ``datediff(end, start)``."""
    return F.datediff(end, start)


def datediff_month(start: Column, end: Column) -> Column:
    """T-SQL ``DATEDIFF(month,...)``: month-boundary crossings."""
    return ((F.year(end) - F.year(start)) * 12 + (F.month(end) - F.month(start))).cast("int")


def eomonth(col: Column, months_to_add: int = 0) -> Column:
    """T-SQL ``EOMONTH(d [, n])``."""
    base = F.add_months(col, months_to_add) if months_to_add else col
    return F.last_day(base)


def convert_103(col: Column) -> Column:
    """``CONVERT(datetime, s, 103)``: parse dd/MM/yyyy; NULL on failure."""
    return F.try_to_timestamp(col, F.lit("dd/MM/yyyy"))


def try_cast_timestamp(col: Column) -> Column:
    """``TRY_CAST(s AS datetime)``: NULL instead of error on bad input."""
    return col.try_cast("timestamp")


def try_cast_date(col: Column) -> Column:
    return col.try_cast("date")


def isnull(col: Column, default: Column) -> Column:
    """T-SQL ``ISNULL(a, b)``."""
    return F.coalesce(col, default)


def hashbytes_sha2_256(col: Column) -> Column:
    """``convert(nvarchar(64), hashbytes('SHA2_256', cast(x as nvarchar)), 2)``
    — uppercase hex SHA-256 of the string form."""
    return F.upper(F.sha2(col.cast("string"), 256))


def datefromparts(y: Column, m: Column, d: Column) -> Column:
    return F.make_date(y, m, d)


def dateadd_month(n: int, col: Column) -> Column:
    return F.add_months(col, n)


def dateadd_day(n: int, col: Column) -> Column:
    return F.date_add(col, n)


def dateadd_seconds(n: int, col: Column) -> Column:
    """``DATEADD(s, n, d)`` — the reference's month-end trick
    ``dateadd(s,-1, first_of_next_month)`` (LoadHistoricalARTOutcomes.sql:214)."""
    return (col.cast("timestamp") + F.expr(f"interval {n} seconds"))
