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
