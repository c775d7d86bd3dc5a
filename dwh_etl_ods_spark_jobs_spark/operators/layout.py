"""Data-layout utilities: Z-order (Morton) clustering keys.

At 100 TB the dominant read cost is files scanned, not rows computed;
file-skipping needs each file's min/max envelope to be TIGHT on the
columns queries filter by. Sorting by one column leaves the other's
envelope global; interleaving the bits of both (Morton order, the key
Delta's OPTIMIZE ZORDER BY sorts on) bounds BOTH envelopes per file.
Usage: ``df.repartitionByRange(N, morton_code(x, y)).sortWithinPartitions
(...)`` before the write — the code is a pure integer expression, so the
layout pass is one range shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["morton_code", "morton_code_sql", "MORTON_BITS"]

MORTON_BITS = 16


def morton_code(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into one
    2·bits-bit Z-order key (x in even positions, y in odd). Inputs are
    masked to ``bits`` first — quantize wider domains before calling.
    Pure shift/and/or expression tree, identical in DuckDB.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_code_sql(x: str, y: str, bits: int = MORTON_BITS) -> str:
    """DuckDB rendering of :func:`morton_code` (same mask, same term
    order)."""
    mask = (1 << bits) - 1
    xm = f"(CAST({x} AS BIGINT) & {mask})"
    ym = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
