"""Encoding-artifact (mojibake) detection for corpus curation.

Documents that went through a UTF-8 -> Latin-1/Windows-1252 -> UTF-8
round trip carry telltale digraphs ("Ã©" for e-acute, the
"â€" family for curly quotes/dashes) or U+FFFD replacement
characters; a training pipeline drops or repairs them. Counting is pure
literal substring arithmetic (length-difference over replace) — no
regex, so Spark and DuckDB can never disagree on a count, and the whole
operator is scan-side (zero shuffle).

All artifact literals are BMP characters, identical length units in
Java (UTF-16) and DuckDB (codepoints); astral emoji in the surrounding
text would make the two engines' ``length()`` disagree on ``n_chars``,
which only shifts the ppm denominator — documented, and irrelevant for
the ASCII-dominant corpora the battery runs on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ENCODING_ARTIFACTS",
    "encoding_artifact_stats",
    "encoding_artifact_sql_columns",
    "COMPRESSION_SCHEMA",
    "compression_ratio",
    "compression_ratio_batches",
]

# The replacement char, the common Latin-1-mojibake vowel digraphs, the
# Windows-1252 punctuation family, and the double-encoded NBSP.
ENCODING_ARTIFACTS: tuple[str, ...] = (
    "�",            # U+FFFD replacement character
    "Ã©",      # 'Ã©'  e-acute read as Latin-1
    "Ã¨",      # 'Ã¨'  e-grave
    "Ã§",      # 'Ã§'  c-cedilla
    "Ã±",      # 'Ã±'  n-tilde
    "Ã¼",      # 'Ã¼'  u-umlaut
    "Ã¶",      # 'Ã¶'  o-umlaut
    "Ã¤",      # 'Ã¤'  a-umlaut
    "â€™",  # 'â€™' right single quote mojibake
    "â€œ",  # 'â€œ' left double quote
    "â€“",  # 'â€“' en dash
    "â€”",  # 'â€”' em dash
    "â€¦",  # 'â€¦' ellipsis
    "Â ",      # 'Â ' double-encoded NBSP
)


def _count_literal(col: Column, lit: str) -> Column:
    """Exact occurrence count of literal ``lit``: length difference after
    removing every occurrence, divided by the literal's length. The
    difference is an exact multiple of ``len(lit)``, so the double
    division is exact."""
    diff = (F.length(col) - F.length(F.replace(col, F.lit(lit), F.lit("")))).cast(
        "long"
    )
    return (diff / F.lit(len(lit))).cast("long")


def _exact_div(num: Column, den: Column) -> Column:
    """Exact BIGINT floor division as pure Column ops (the repo's
    ``(x - pmod(x, c)) / c`` idiom — the subtraction makes the double
    division exact)."""
    return ((num - F.pmod(num, den)) / den).cast("long")


def encoding_artifact_stats(text_col: Column) -> dict[str, Column]:
    """Column dict: ``n_chars``, ``n_artifacts`` (total occurrences of
    :data:`ENCODING_ARTIFACTS`), ``artifact_ppm`` (occurrences per
    million characters, exact integer; 0 for empty/NULL-length text).
    Filter on ``artifact_ppm`` to drop encoding-damaged documents."""
    n_chars = F.length(text_col).cast("long")
    total: Column | None = None
    for lit in ENCODING_ARTIFACTS:
        c = _count_literal(text_col, lit)
        total = c if total is None else total + c
    total = total.cast("long")
    ppm = (
        F.when(n_chars > 0, _exact_div(total * F.lit(1_000_000), n_chars))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return {"n_chars": n_chars, "n_artifacts": total, "artifact_ppm": ppm}


def encoding_artifact_sql_columns(expr: str) -> dict[str, str]:
    """DuckDB renderings of :func:`encoding_artifact_stats` — identical
    literals, identical length-difference arithmetic, ``//`` integer
    division."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    counts = " + ".join(
        f"((length({expr}) - length(replace({expr}, '{esc(lit)}', ''))) "
        f"// {len(lit)})"
        for lit in ENCODING_ARTIFACTS
    )
    total = f"CAST({counts} AS BIGINT)"
    return {
        "n_chars": f"CAST(length({expr}) AS BIGINT)",
        "n_artifacts": total,
        "artifact_ppm": (
            f"CAST(CASE WHEN length({expr}) > 0 "
            f"THEN ({total} * 1000000) // length({expr}) "
            f"ELSE 0 END AS BIGINT)"
        ),
    }


# --- compression-ratio quality signal (Arrow-batched Python boundary) ---

COMPRESSION_SCHEMA = (
    "doc_id long, n_bytes long, n_zlib long, compression_ppm long"
)


def compression_ratio_batches(batches):
    """zlib-level-6 compressed size per document, Arrow batch at a time.
    ``compression_ppm = n_zlib*1e6 div n_bytes`` — LOW values mean highly
    repetitive text (the RefinedWeb/Gopher-style compression filter; a
    near-1e6 value is incompressible, likely already-compressed noise or
    high-entropy garbage). zlib level 6 output is deterministic for a
    given input across CPython builds (same zlib stream parameters), so
    the signal is retry-stable."""
    import zlib

    import pandas as pd

    for pdf in batches:
        data = pdf["text"].fillna("").map(lambda s: s.encode("utf-8"))
        n_bytes = data.map(len).astype("int64")
        n_zlib = data.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
        ppm = (n_zlib * 1_000_000).floordiv(n_bytes.clip(lower=1)).where(
            n_bytes > 0, 0
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "n_zlib": n_zlib,
                "compression_ppm": ppm.astype("int64"),
            }
        )


def compression_ratio(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """mapInPandas driver: ``(doc_id, n_bytes, n_zlib, compression_ppm)``
    per document. The ONLY Python-boundary text operator in the repo —
    justified because no Catalyst expression computes a DEFLATE stream;
    Arrow batches keep the transfer columnar and the cost is one
    C-implemented zlib call per doc (no per-row Python arithmetic
    beyond the map). Non-SQL-expressible -> pytest-gated vs direct zlib,
    like the streaming operators."""
    from pyspark.sql import functions as F  # noqa: F811

    payload = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return payload.mapInPandas(
        compression_ratio_batches, schema=COMPRESSION_SCHEMA
    )
