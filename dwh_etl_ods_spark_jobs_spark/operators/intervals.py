"""Interval-overlap join — the non-equi join, made shuffle-joinable.

A naive ``a.start <= b.end AND b.start <= a.end`` predicate has no equi
key, so Spark plans it as BroadcastNestedLoop (or cartesian) — O(|A|·|B|)
comparisons, a non-starter at 100 TB. The standard scale rewrite: chunk
the number line, explode each interval to the chunks it touches (fan-out
bounded by interval_length / chunk + 1), equi-join on the chunk id, then
verify the exact overlap predicate inside the chunk-matched candidates.
Every true overlap shares at least one chunk, so recall is exact; the
DuckDB oracle runs the plain non-equi join, proving the rewrite's
semantics rather than mirroring its plan.

To avoid emitting a pair once per shared chunk (and the distinct-shuffle
that dedup would cost), each pair is counted only in the FIRST chunk both
intervals cover: ``chunk == max(a.start_chunk, b.start_chunk)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    chunk: int,
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] integer intervals
    overlap (inclusive ends). Both inputs keep their payload columns
    (collisions aside from the interval columns should be renamed first);
    output = left columns prefixed ``a_``, right prefixed ``b_``.

    Intervals must satisfy ``start <= end``: an inverted interval would
    hit Spark's descending-``sequence`` footgun (cf. curation._word_ngrams)
    and fabricate chunk ids — validate upstream.

    ``chunk`` trades fan-out for selectivity: set it near the typical
    interval length so most intervals explode to O(1) chunks.
    """

    # exact integer floor-division: pmod gives the nonnegative remainder,
    # so the adjusted dividend is exactly divisible and `div` (truncating)
    # equals floor — correct for negative starts and exact beyond 2^53,
    # where `floor(x / chunk)` through double division loses integers
    def _floor_chunk(col_sql: str):
        return F.expr(f"(({col_sql}) - pmod(({col_sql}), {chunk})) div {chunk}")

    def chunked(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        )
        sname, ename = f"{prefix}{start_col}", f"{prefix}{end_col}"
        # helper columns use a __iv_ namespace that user columns (all
        # prefixed a_/b_ by now) can never collide with
        return renamed.select(
            "*",
            F.explode(
                F.sequence(_floor_chunk(sname), _floor_chunk(ename))
            ).alias("__iv_chunk"),
            _floor_chunk(sname).alias(f"__iv_{prefix}sc"),
        )

    a = chunked(left, "a_")
    b = chunked(right, "b_")
    asc, bsc = F.col("__iv_a_sc"), F.col("__iv_b_sc")
    return (
        a.join(b, "__iv_chunk")
        .filter(F.col("__iv_chunk") == F.greatest(asc, bsc))
        .filter(
            (F.col(f"a_{start_col}") <= F.col(f"b_{end_col}"))
            & (F.col(f"b_{start_col}") <= F.col(f"a_{end_col}"))
        )
        .drop("__iv_chunk", "__iv_a_sc", "__iv_b_sc")
    )
