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

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ENCODING_ARTIFACTS",
    "encoding_artifact_stats",
    "encoding_artifact_sql_columns",
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
