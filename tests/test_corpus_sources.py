"""Corpus file source/sink tests (sources/corpus.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.curation import pack_token_shards
from dwh_etl_ods_spark_jobs_spark.sources.corpus import (
    export_training_shards,
    read_csv_manifest,
    read_jsonl,
    read_text_docs,
    split_quarantine,
)

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING"


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        '{"doc_id": 2, "text": "truncated...',          # malformed
        json.dumps({"doc_id": 3, "text": "bonjour", "lang": "fr"}),
        "not json at all",
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines))
    clean, dirty = split_quarantine(read_jsonl(spark, str(p), DOC_SCHEMA))
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert got == {1: ("hello world", "en"), 3: ("bonjour", "fr")}
    bad = sorted(r.raw_line for r in dirty.collect())
    assert bad == ["not json at all", '{"doc_id": 2, "text": "truncated...']
    # the capture column never leaks into the clean half
    assert "_corrupt_record" not in clean.columns


def test_read_csv_manifest(spark, tmp_path):
    f = tmp_path / "manifest.csv"
    f.write_text("shard,url,n_docs\n0,https://x/0.warc,100\n1,https://x/1.warc,250\n")
    rows = read_csv_manifest(
        spark, str(f), "shard INT, url STRING, n_docs LONG"
    ).collect()
    assert {(r.shard, r.n_docs) for r in rows} == {(0, 100), (1, 250)}


def test_read_text_docs_line_and_wholefile(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo doc\n")
    by_line = read_text_docs(spark, str(d))
    assert by_line.count() == 3
    whole = {
        os.path.basename(r.source_file): r.text
        for r in read_text_docs(spark, str(d), whole_file=True).collect()
    }
    assert whole["a.txt"] == "line one\nline two\n"
    assert whole["b.txt"] == "solo doc\n"


def test_export_training_shards_layout(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "w " * 50) for i in range(40)], "doc_id long, text string"
    )
    sharded = docs.join(
        docs.transform(
            pack_token_shards("doc_id", F.size(F.split("text", " ")), 500)
        ).select("doc_id", "shard"),
        "doc_id",
    )
    out = tmp_path / "shards"
    export_training_shards(sharded, str(out))
    dirs = sorted(p for p in os.listdir(out) if p.startswith("shard="))
    # 40 docs x 51 tokens = 2040 total / 500-token budget -> shards 0..3
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.json(str(out))
    assert back.count() == 40
    # round-trips with the shard readable as a partition column
    assert back.select(F.countDistinct("shard")).collect()[0][0] == 4


def test_payload_blockhash_near_dup_via_simhash_banding(spark):
    """Codec-free binary near-dup: a lightly perturbed payload lands
    within hamming<=3 of its original through the EXISTING simhash
    banding; an unrelated payload does not pair."""
    import numpy as np

    from dwh_etl_ods_spark_jobs_spark.dedup import simhash_near_pairs
    from dwh_etl_ods_spark_jobs_spark.multimodal import (
        BLOCKHASH_BITS,
        payload_blockhash,
    )

    rng = np.random.RandomState(7)  # test fixture only, never in operators
    base = rng.randint(0, 256, 6000).astype(np.uint8)
    near = base.copy()
    near[100:110] = 255  # tiny edit: flips at most a couple of blocks
    other = rng.randint(0, 256, 6000).astype(np.uint8)

    rows = [
        (1, bytearray(base.tobytes())),
        (2, bytearray(near.tobytes())),
        (3, bytearray(other.tobytes())),
        (4, bytearray(b"")),  # empty payload -> sig 0, pairs with nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = payload_blockhash(df)

    got = {r.doc_id: r.simhash for r in sigs.collect()}
    assert got[4] == 0
    assert 0 <= got[1] < (1 << BLOCKHASH_BITS)

    # python reference for the signature itself
    def ref(a):
        if a.size == 0:
            return 0
        m, out = a.mean(), 0
        for i, blk in enumerate(np.array_split(a, BLOCKHASH_BITS)):
            if blk.size and blk.mean() >= m:
                out |= 1 << i
        return out

    assert got[1] == ref(base) and got[3] == ref(other)

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs
