"""Oracle parity for battery-retired queries.

Battery consolidation (VERDICT r6 #7, widened r8/r9/r10) removed
parameterization-subsumed entries from the driver battery; each still runs
here against its DuckDB oracle at sf0.001 so the operator surface it
exercised (df.rollup/df.cube, multi-DISTINCT Expand, the string-function
suite, tumbling rollup, global sort+limit, single-probe LSH / nprobe=1
IVF, simhash signature stage, degree histogram, corpus top tokens; r10:
text stats/filter pipeline, exact n-gram Jaccard, multiprobe-LSH and
nprobe=2-IVF ANN, TPC-H Q5/Q14 shapes, full-outer coalesce, gap
sessionize; r11: minhash-LSH raw pairs, embedding-cosine raw pairs,
BPE train-only, hopping HLL, chi2 contingency, TPC-H Q17, LOCF gap
fill, global MAD census, W1 drift, ungrouped weighted quantiles; r12:
BM25 top-k retrieval, the word/bigram Gopher repetition signals, the
grouped corr/OLS bivariate suite, the Kaplan-Meier retention readout;
r14: the Theil-Sen slope readout, the plain reliability curve, the
weekday median/MAD seasonal residual screen — each subsumed by its
staged_r16/r17 superset entering the battery, the staged_r17.py
shortlist confirmed per VERDICT r13 #2) keeps a correctness gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import (
    coverage,
    curation,
    graph,
    pipeline,
    quality,
    showcase,
    sketches,
    staged,
    staged_r9,
    staged_r10,
    staged_r11,
    staged_r14,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

RETIRED = [
    (mod, name)
    for mod in (
        coverage, pipeline, graph, curation, sketches, staged, showcase,
        quality, staged_r9, staged_r10, staged_r11, staged_r14,
    )
    for name in mod.RETIRED_QUERIES
]


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize(
    "mod,name", RETIRED, ids=[name for _, name in RETIRED]
)
def test_retired_query_matches_duckdb(spark, sf_dir, mod, name):
    con = _connect(sf_dir)
    sdf = mod.RETIRED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(mod.RETIRED_ORACLES[name]).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ddf.columns]
    assert len(sdf) == len(ddf)
    ddf.columns = list(sdf.columns)
    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    d = ddf.sort_values(key, na_position="first").reset_index(drop=True)
    s = s.astype(d.dtypes.to_dict())
    assert s.equals(d), f"{name}: value mismatch\n{s.head()}\n{d.head()}"


def test_retired_names_stay_out_of_the_battery():
    import __spark_entry__ as entry_mod

    battery = set(entry_mod.queries())
    retired = {name for _, name in RETIRED}
    assert not (battery & retired), (
        "retired queries leaked back into the driver battery: "
        f"{sorted(battery & retired)}"
    )
