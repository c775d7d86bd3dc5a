"""Schema-drift handling for incremental loads.

Upstream systems add, drop, and retype columns without warning; the
reference pins every job to a DDL-ordered projection (jobs/spec.py), so
a drifted source either crashes the job or — worse — silently feeds a
misaligned SELECT *. ``diff_schemas`` classifies the drift and
``align_schema`` conforms a batch to the target schema under an explicit
policy, so load jobs fail loudly exactly when a human must decide, and
never reorder or misplace a column.

Pure metadata + projection (zero shuffle, zero data movement beyond the
scan); safe to run on every micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["SchemaDrift", "diff_schemas", "align_schema"]


@dataclass(frozen=True)
class SchemaDrift:
    """Classified difference between a batch schema and the target."""

    added: tuple[str, ...]        # in batch, not in target
    missing: tuple[str, ...]      # in target, not in batch
    retyped: tuple[tuple[str, str, str], ...]  # (col, batch_type, target_type)

    @property
    def is_clean(self) -> bool:
        return not (self.added or self.missing or self.retyped)


def diff_schemas(batch_schema: StructType, target: StructType) -> SchemaDrift:
    """Name-keyed drift classification (case-sensitive, order-insensitive —
    column order is projection's job, not a drift)."""
    b = {f.name: f.dataType for f in batch_schema.fields}
    t = {f.name: f.dataType for f in target.fields}
    added = tuple(sorted(set(b) - set(t)))
    missing = tuple(sorted(set(t) - set(b)))
    retyped = tuple(
        (name, b[name].simpleString(), t[name].simpleString())
        for name in sorted(set(b) & set(t))
        if b[name] != t[name]
    )
    return SchemaDrift(added=added, missing=missing, retyped=retyped)


def align_schema(
    df: DataFrame,
    target: StructType,
    on_added: str = "drop",
    on_missing: str = "null",
    on_retyped: str = "cast",
) -> DataFrame:
    """Conform ``df`` to ``target``: the result has exactly the target's
    columns, in the target's order, with the target's types.

    Policies (each also accepts ``'error'`` to fail loudly):

    - ``on_added``:   ``'drop'`` extra batch columns.
    - ``on_missing``: ``'null'`` — typed NULL fill (the reference's own
      convention for absent DDL columns, jobs/spec.py).
    - ``on_retyped``: ``'cast'`` — ANSI-safe ``try_cast`` to the target
      type (unconvertible values become NULL, never a job crash mid-load;
      use ``'error'`` for strictness).
    """
    for arg, val, allowed in (
        ("on_added", on_added, ("drop", "error")),
        ("on_missing", on_missing, ("null", "error")),
        ("on_retyped", on_retyped, ("cast", "error")),
    ):
        if val not in allowed:
            raise ValueError(f"{arg} must be one of {allowed}, got {val!r}")
    drift = diff_schemas(df.schema, target)
    problems = []
    if drift.added and on_added == "error":
        problems.append(f"unexpected columns {list(drift.added)}")
    if drift.missing and on_missing == "error":
        problems.append(f"missing columns {list(drift.missing)}")
    if drift.retyped and on_retyped == "error":
        problems.append(
            "retyped columns "
            + str([f"{c}: {b} -> {t}" for c, b, t in drift.retyped])
        )
    if problems:
        raise ValueError("schema drift: " + "; ".join(problems))

    have = {f.name for f in df.schema.fields}
    retyped = {c for c, _, _ in drift.retyped}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif f.name in retyped:
            cols.append(
                F.col(f.name).try_cast(f.dataType.simpleString()).alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
