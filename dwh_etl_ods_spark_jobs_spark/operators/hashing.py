"""In-flight PII hashing.

The reference hashes PII *after* the write, with a raw T-SQL UPDATE:
``UPDATE t SET xHash = convert(nvarchar(64), hashbytes('SHA2_256',
cast(x as nvarchar(36))), 2)`` (``Core/.../DatabaseUtils.java:54-69``,
invoked by 48 jobs). The output format is uppercase hex. The same
computation exists Spark-side in the reference (live at
``LoadARTPatients.java:180-181``), proving
``upper(sha2(cast(x as string), 256))`` is byte-identical.

We compute it in-flight: one Project node, no post-write round trip, and
the sink never sees a row without its hash (better failure semantics than
the reference's two-phase write+update).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_pii(cols: Sequence[str] | Mapping[str, str]) -> "callable":
    """Add ``<col>Hash`` columns (or explicit src->dst mapping) as
    uppercase-hex SHA2-256 of the string-cast source column."""
    mapping = cols if isinstance(cols, Mapping) else {c: f"{c}Hash" for c in cols}

    def _apply(df: DataFrame) -> DataFrame:
        for src, dst in mapping.items():
            df = df.withColumn(dst, F.upper(F.sha2(F.col(src).cast("string"), 256)))
        return df

    return _apply
