"""Encoding-artifact detection (text/encoding.py) — r8-staged operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.text.encoding import (
    ENCODING_ARTIFACTS,
    encoding_artifact_sql_columns,
    encoding_artifact_stats,
)


def _mojibake(s: str) -> str:
    """Simulate the UTF-8 -> Windows-1252 misread that produces mojibake."""
    return s.encode("utf-8").decode("windows-1252")


ROWS = [
    (0, "perfectly clean ascii text"),
    (1, _mojibake("café crème")),                  # vowel digraphs
    (2, _mojibake("it’s a “test – really… — done")),
    (3, "broken �� replacement chars"),
    (4, ""),                                        # empty text -> ppm 0
]


def test_artifact_literals_are_real_mojibake():
    """Every non-FFFD literal is exactly what some UTF-8 sequence becomes
    when misread as Windows-1252 — the detector hunts real-world damage,
    not arbitrary strings."""
    sources = ["é", "è", "ç", "ñ", "ü", "ö", "ä",
               "’", "“", "–", "—", "…", " "]
    produced = {_mojibake(s) for s in sources}
    for lit in ENCODING_ARTIFACTS:
        if lit == "�":
            continue
        assert lit in produced, repr(lit)


def test_encoding_artifact_stats_counts(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    stats = encoding_artifact_stats(F.col("text"))
    out = {
        r.doc_id: (r.n_artifacts, r.artifact_ppm)
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in stats.items()]
        ).collect()
    }
    assert out[0] == (0, 0)
    assert out[1][0] == 2            # Ã© twice (café, crème -> Ã© and Ã¨)
    assert out[2][0] == 5            # ’ “ – … — each once
    assert out[3][0] == 2            # two U+FFFD
    assert out[4] == (0, 0)          # empty text: guarded ppm
    assert out[1][1] > 0


def test_encoding_artifact_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    stats = encoding_artifact_stats(F.col("text"))
    spdf = (
        df.select("doc_id", *[v.alias(k) for k, v in stats.items()])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = encoding_artifact_sql_columns("text")
    con = duckdb.connect()
    con.register("t", pdf)
    sql = "SELECT doc_id, " + ", ".join(
        f"{v} AS {k}" for k, v in cols.items()
    ) + " FROM t ORDER BY doc_id"
    ddf = con.execute(sql).df()
    for c in ("n_chars", "n_artifacts", "artifact_ppm"):
        assert list(spdf[c].astype("int64")) == list(ddf[c].astype("int64")), c


def test_encoding_artifact_is_scan_side_only(spark):
    df = spark.range(1000).selectExpr("CAST(id AS STRING) AS text")
    stats = encoding_artifact_stats(F.col("text"))
    plan = (
        df.select(*[v.alias(k) for k, v in stats.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero shuffle: pure projection


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from dwh_etl_ods_spark_jobs_spark.text.encoding import compression_ratio

    rows = [
        (0, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),   # hyper-repetitive
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "x9$Kq2!pW7@zR4#mT8%vN1^bL5&cJ3*dF6(gH0)"),    # high entropy
        (3, ""),                                            # empty -> ppm 0
        (4, None),                                          # NULL -> as empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df, "text", "doc_id").collect()}
    for doc_id, text in rows:
        b = (text or "").encode("utf-8")
        r = out[doc_id]
        assert r.n_bytes == len(b)
        assert r.n_zlib == len(zlib.compress(b, 6))
        if len(b):
            assert r.compression_ppm == (r.n_zlib * 1_000_000) // len(b)
        else:
            assert r.compression_ppm == 0
    # the signal orders as designed: repetitive << prose < random-ish
    assert out[0].compression_ppm < out[1].compression_ppm < out[2].compression_ppm


def test_compression_ratio_is_arrow_batched_python(spark):
    """The plan must show the Arrow-batched mapInPandas boundary (and a
    single pass — no shuffle added by the operator)."""
    from dwh_etl_ods_spark_jobs_spark.text.encoding import compression_ratio

    df = spark.range(100).selectExpr("id AS doc_id", "repeat('ab', CAST(id AS INT)) AS text")
    out = compression_ratio(df, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert out.count() == 100


def test_pcm_window_energy_matches_numpy_reference(spark):
    """Raw-PCM windows: exact int64 energy/peak vs a direct numpy
    computation, including the ragged final window and odd-byte tails."""
    import struct

    import numpy as np

    from dwh_etl_ods_spark_jobs_spark.multimodal import pcm_window_energy

    def pcm(samples):
        return struct.pack(f"<{len(samples)}h", *samples)

    s1 = [100, -200, 300, -32768, 32767, 0, 7, -7, 15, 2]   # 10 samples
    s2 = [5] * 3
    rows = [
        (1, bytearray(pcm(s1))),
        (2, bytearray(pcm(s2) + b"\x01")),  # odd trailing byte dropped
        (3, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.win_idx): (r.n_samples, r.energy, r.peak)
        for r in pcm_window_energy(df, window_samples=4, hop=2).collect()
    }
    for doc_id, samples in ((1, s1), (2, s2)):
        x = np.array(samples, dtype=np.int64)
        i = w = 0
        while i < len(x):
            win = x[i : i + 4]
            assert got[(doc_id, w)] == (
                len(win), int((win * win).sum()), int(np.abs(win).max())
            )
            i += 2
            w += 1
    assert not any(k[0] == 3 for k in got)  # empty payload -> no windows
