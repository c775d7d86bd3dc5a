"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas functions over ``mapInPandas`` — the Spark-side
plumbing (schema contracts, batch iteration, partition-parallel execution)
is real and tested, while the codec itself is swappable:

- ``decode_meta_batches``   — deterministic *fake* decode that parses the
  payload bytes directly (magic, byte length, derived width/height, first
  byte). Used by tests and oracles: its outputs are pure functions of the
  bytes, so a SQL oracle can reproduce them exactly.
- ``decode_image_real``     — the real-codec slot. The container ships no
  image/audio libraries, so this STUB raises ``NotImplementedError`` unless
  PIL is importable; the mapInPandas wiring around it is identical.

Scale notes: mapInPandas streams Arrow record batches — constant memory per
task regardless of partition size; binary payloads never pass through
Python row-by-row. Frame sampling explodes one input row into N output
rows *inside* the pandas iterator, so output batching is preserved.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

try:  # real codec gate — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MAGIC_LEN = 4
FRAME_CHUNK = 64  # bytes per sampled "frame"

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("magic", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("first_byte", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Synthesize an opaque binary payload column from a text column (the
    test tables carry no real media); downstream operators treat it as
    bytes only. Returns (doc_id, payload: binary)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
    )


def decode_meta_batches(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Fake decode: extract typed metadata as pure byte arithmetic.

    width/height derive from byte_len so a SQL oracle reproduces them; in a
    real pipeline these come out of the codec header instead — same
    schema, same batch shape."""
    import pandas as pd

    for pdf in batches:
        payload = pdf["payload"]
        byte_len = payload.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "magic": payload.map(
                    lambda b: bytes(b[:MAGIC_LEN]).decode("ascii", "replace")
                ),
                "byte_len": byte_len.astype("int64"),
                "width": (1 + byte_len % 640).astype("int32"),
                "height": (1 + byte_len % 480).astype("int32"),
                "first_byte": payload.map(lambda b: int(b[0]) if len(b) else -1).astype(
                    "int32"
                ),
            }
        )


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """mapInPandas driver for metadata extraction over (doc_id, payload)."""
    return payloads.mapInPandas(decode_meta_batches, schema=IMAGE_META_SCHEMA)


def frame_sample_batches(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Fake frame sampler: split each payload into FRAME_CHUNK-byte frames,
    emit per-frame length + byte-sum checksum (oracle-reproducible)."""
    import pandas as pd

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i in range(0, max(len(b), 1), FRAME_CHUNK):
                chunk = b[i : i + FRAME_CHUNK]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i // FRAME_CHUNK)
                out["frame_len"].append(len(chunk))
                out["frame_checksum"].append(sum(chunk))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_len": pd.Series(out["frame_len"], dtype="int32"),
                "frame_checksum": pd.Series(out["frame_checksum"], dtype="int64"),
            }
        )


def frame_sample(payloads: DataFrame) -> DataFrame:
    """mapInPandas driver for frame sampling over (doc_id, payload)."""
    return payloads.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA)


def decode_image_real(payloads: DataFrame) -> DataFrame:  # pragma: no cover
    """REAL-codec slot (STUB): decode payloads with PIL and emit
    (doc_id, width, height, mode). The container intentionally ships no
    image libraries; raise loudly rather than fake it here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "decode_image_real requires PIL, which is not installed in this "
            "environment. Use decode_image_meta (deterministic fake decode) "
            "for the tested plumbing; swap in this function when a codec "
            "library is available."
        )

    import io

    import pandas as pd

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
        ]
    )

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from PIL import Image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(payload)))
                rows.append((doc_id, img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mode"])

    return payloads.mapInPandas(decode, schema=schema)


# --- codec-free binary near-duplicate signatures ---

BLOCKHASH_BITS = 60  # matches dedup.SIMHASH_BITS: the banding reuses as-is


def payload_blockhash_batches(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Average-hash over raw bytes (aHash without a codec): split the
    payload into BLOCKHASH_BITS equal byte blocks; bit b = 1 iff
    mean(block b) >= mean(payload). Deterministic, pure byte arithmetic —
    near-identical payloads (re-encodes, appended metadata, small edits)
    flip few bits, so hamming distance ranks similarity. Empty payloads
    hash to 0."""
    import numpy as np
    import pandas as pd

    def sig(b) -> int:
        a = np.frombuffer(bytes(b), dtype=np.uint8)
        if a.size == 0:
            return 0
        overall = a.mean()
        out = 0
        for i, block in enumerate(np.array_split(a, BLOCKHASH_BITS)):
            if block.size and block.mean() >= overall:
                out |= 1 << i
        return out

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "simhash": pdf["payload"].map(sig).astype("int64"),
            }
        )


def payload_blockhash(payloads: DataFrame) -> DataFrame:
    """mapInPandas driver: ``(doc_id, simhash)`` block-hash signatures over
    (doc_id, payload) — feed straight into ``dedup.simhash_near_pairs``
    (same 60-bit layout, same pigeonhole banding) for codec-free binary
    near-dup detection at corpus scale. Arrow-batched; zero shuffle."""
    return payloads.mapInPandas(
        payload_blockhash_batches, schema="doc_id long, simhash long"
    )


# ---------------------------------------------------------------------------
# Raw-PCM window energy (REAL signal processing — codec-free)
# ---------------------------------------------------------------------------

PCM_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("energy", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def pcm_window_energy_batches(window_samples: int, hop: int):
    """Batch fn factory: interpret each payload as little-endian int16 PCM
    and emit per-window exact-integer energy (sum x²) and peak |x|.

    Unlike the image decode (codec libs absent -> declared stub), raw PCM
    needs NO codec: ``numpy.frombuffer`` + a strided window is the whole
    decoder, so this path is REAL end-to-end — the shape every
    audio-feature stage (VAD energy gating, loudness filters, silence
    trimming) starts from. Energies are int64-exact (max |x|=32768 ->
    x² ≤ 2³⁰, 2³³ windows before overflow), so results are deterministic
    and partitioning-independent.
    """
    import numpy as np
    import pandas as pd

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "win_idx": [], "n_samples": [],
                "energy": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n = len(buf) // 2 * 2  # whole int16 samples only
                x = np.frombuffer(buf[:n], dtype="<i2").astype(np.int64)
                i, w = 0, 0
                while i < len(x):
                    win = x[i : i + window_samples]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(w)
                    out["n_samples"].append(len(win))
                    out["energy"].append(int((win * win).sum()))
                    out["peak"].append(int(np.abs(win).max()) if len(win) else 0)
                    i += hop
                    w += 1
            yield pd.DataFrame(out)

    return fn


def pcm_window_energy(
    payloads: DataFrame, window_samples: int = 256, hop: int = 128
) -> DataFrame:
    """mapInPandas driver: per-window PCM energy over (doc_id, payload).

    Scale: Arrow-batched, partition-parallel, constant memory per batch;
    output fan-out = payload_bytes / (2·hop) rows per doc — bounded by
    input size, never quadratic. ``hop < window_samples`` gives
    overlapping windows (the standard 50% overlap default).
    """
    if hop < 1 or window_samples < 1:
        raise ValueError("window_samples and hop must be >= 1")
    return payloads.mapInPandas(
        pcm_window_energy_batches(window_samples, hop),
        schema=PCM_ENERGY_SCHEMA,
    )


# --- codec-free binary type sniffing (magic bytes) ---

# (name, hex prefix) — longest-prefix-first so RIFF containers (WAV/AVI)
# disambiguate on their format tag at offset 8.
MAGIC_SIGNATURES = [
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("gif", "474946383"),          # GIF87a / GIF89a share this prefix
    ("bmp", "424D"),               # "BM" (BITMAPFILEHEADER)
    ("pdf", "25504446"),
    ("zip", "504B0304"),
    ("gzip", "1F8B"),
]
RIFF_TAGS = [("wav", "57415645"), ("avi", "41564920")]  # bytes 9..12


def sniff_type(bin_col: Column) -> Column:
    """Media type from MAGIC BYTES — the codec-free triage every binary
    ingest pipeline runs before routing payloads to a decoder (or a
    quarantine): a pure scan-side expression (hex prefix compare), no
    Python boundary, no codec lib. RIFF containers disambiguate on the
    format tag at offset 8 (WAV vs AVI); unknown/NULL/short payloads
    label 'unknown'. Whole-stage-codegen friendly at any corpus size."""
    head = F.upper(F.hex(F.substring(bin_col, 1, 16)))
    riff = F.upper(F.hex(F.substring(bin_col, 9, 4)))
    out = F.lit("unknown")
    for name, tag in reversed(RIFF_TAGS):
        out = F.when(
            head.startswith("52494646") & (riff == tag), F.lit(name)
        ).otherwise(out)
    for name, sig in reversed(MAGIC_SIGNATURES):
        out = F.when(head.startswith(sig), F.lit(name)).otherwise(out)
    return out


def type_census(payloads: DataFrame, bin_col: str = "payload") -> DataFrame:
    """(media_type, n, total_bytes) census over a binary column — the
    routing/quarantine report sniff_type feeds. One map-side-combinable
    aggregation; NULL payloads count under 'unknown' with 0 bytes."""
    return (
        payloads.select(
            sniff_type(F.col(bin_col)).alias("media_type"),
            F.coalesce(F.length(F.col(bin_col)), F.lit(0)).alias("_len"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_len").cast("long").alias("total_bytes"),
        )
    )


def _be32(bin_col: Column, off: int) -> Column:
    """Big-endian uint32 at 1-based byte offset ``off`` — hex+conv, pure
    expression."""
    return F.conv(F.hex(F.substring(bin_col, off, 4)), 16, 10).cast("long")


def _le(bin_col: Column, off: int, nbytes: int) -> Column:
    """Little-endian unsigned int of ``nbytes`` at 1-based ``off`` —
    per-byte hex+conv recombination (Spark has no reverse-bytes for
    binary), still scan-side."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        b = F.conv(F.hex(F.substring(bin_col, off + i, 1)), 16, 10).cast("long")
        total = total + b * F.lit(256 ** i)
    return total


def parse_media_header(bin_col: Column) -> Column:
    """REAL container-header field extraction as a pure scan-side
    expression — no codec library, no Python boundary::

        struct(media_type, width, height, sample_rate, channels)

    - PNG: width/height are the big-endian uint32s at bytes 17-20 /
      21-24 (8-byte signature + IHDR length + type);
    - BMP: width/height are little-endian int32s at offsets 19 / 23
      (BITMAPINFOHEADER);
    - WAV: channels (LE uint16 @ 23) and sample_rate (LE uint32 @ 25)
      from the canonical fmt chunk;
    - anything else (or a payload shorter than its header): type from
      :func:`sniff_type`, NULL fields.

    This is the part of "decode" that needs no codec: every field is
    fixed-offset byte arithmetic, so it runs inside whole-stage codegen
    at any corpus size.  Pixel decoding stays behind the declared
    :func:`decode_image_real` stub (no image lib in this container);
    header truth is pytest-pinned against ``struct``-packed REAL
    headers.
    """
    t = sniff_type(bin_col)
    blen = F.length(bin_col)
    png_ok = (t == "png") & (blen >= 24)
    bmp_ok = (t == "bmp") & (blen >= 26)
    wav_ok = (t == "wav") & (blen >= 28)
    width = (
        F.when(png_ok, _be32(bin_col, 17))
        .when(bmp_ok, _le(bin_col, 19, 4))
        .cast("long")
    )
    # BMP biHeight is a SIGNED int32 (negative = top-down row order):
    # sign-extend the unsigned LE decode and report abs() — the pixel
    # height — matching what any real decoder returns for both
    # orientations.
    bmp_h_raw = _le(bin_col, 23, 4)
    bmp_h = F.abs(
        F.when(bmp_h_raw > F.lit(2147483647), bmp_h_raw - F.lit(4294967296))
        .otherwise(bmp_h_raw)
    )
    height = (
        F.when(png_ok, _be32(bin_col, 21))
        .when(bmp_ok, bmp_h)
        .cast("long")
    )
    rate = F.when(wav_ok, _le(bin_col, 25, 4)).cast("long")
    chans = F.when(wav_ok, _le(bin_col, 23, 2)).cast("long")
    return F.struct(
        t.alias("media_type"),
        width.alias("width"),
        height.alias("height"),
        rate.alias("sample_rate"),
        chans.alias("channels"),
    )


def pcm_silence_segments(
    payloads: DataFrame,
    window_samples: int = 256,
    silence_energy_per_sample: int = 1000,
) -> DataFrame:
    """Silence/activity segmentation of raw int16 PCM payloads — the
    codec-free VAD/silence-trim stage (which spans of an audio doc are
    worth keeping, where to cut training clips)::

        (doc_id, is_active, seg_start_win, seg_end_win,
         n_windows, total_energy)

    Composes :func:`pcm_window_energy` with NON-overlapping windows
    (hop == window — overlap would double-count boundaries), classifies
    each window by exact integer mean energy per sample
    (``energy > thresh·n_samples`` → active; the multiply keeps it pure
    BIGINT), then folds adjacent same-class windows into segments with
    the gaps-and-islands run id (``win_idx − row_number`` per
    (doc, class) — the ``sessionize`` idiom). Deterministic and
    partitioning-independent end-to-end.

    Scale: the only Python boundary is the existing Arrow-batched PCM
    decode; the run windows partition by doc_id and are bounded by the
    payload's own window count (fan-out = bytes/(2·window), linear).
    """
    from pyspark.sql import Window as W

    en = pcm_window_energy(
        payloads, window_samples=window_samples, hop=window_samples
    ).withColumn(
        "_active",
        (
            F.col("energy")
            > F.lit(int(silence_energy_per_sample)) * F.col("n_samples")
        ).cast("int"),
    )
    w = W.partitionBy("doc_id", "_active").orderBy("win_idx")
    runs = en.withColumn(
        "_run", F.col("win_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_id", "_active", "_run")
        .agg(
            F.min("win_idx").cast("long").alias("seg_start_win"),
            F.max("win_idx").cast("long").alias("seg_end_win"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("energy").cast("long").alias("total_energy"),
        )
        .select(
            "doc_id",
            F.col("_active").cast("int").alias("is_active"),
            "seg_start_win",
            "seg_end_win",
            "n_windows",
            "total_energy",
        )
    )
