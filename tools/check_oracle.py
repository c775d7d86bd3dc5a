"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [--log-sweep N] [sf_dir] [query ...]

``--log-sweep N`` records the PASSing query names into
``tools/sweep_log.json`` under round ``N`` — the committed evidence the
_TAIL freshness invariant (tests/test_entry_contract.py) accepts for
battery entries the driver's 50-slot gate window dropped that round.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v) -> str:
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if v is None or v != v:  # NaN/None
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        # normalize date vs midnight-timestamp representation differences
        return pd.Timestamp(v).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _warn_complex_columns(name: str, sdf: pd.DataFrame) -> None:
    """The DRIVER's canonicalizer (unlike this replica) cannot hash
    array/struct cells — pandas `sort_values` dies on `unhashable type:
    'list'` (CORRECTNESS_r06 `embedding_quantize_int8`). Warn loudly so a
    locally-green query can't sail into a hard-gate red again."""
    bad = [
        c
        for c in sdf.columns
        if len(sdf) and isinstance(sdf[c].iloc[0], (list, tuple, dict))
        or (len(sdf) and type(sdf[c].iloc[0]).__name__ == "ndarray")
    ]
    if bad:
        print(
            f"WARN  {name}: columns {bad} carry array/struct cells — the "
            "DRIVER gate cannot hash these; serialize them (array_join / "
            "array_to_string) in the final projection"
        )


def canonical_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        ",".join(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def _record_sweep(round_no: int, sf_dir: str, passed: list[str]) -> None:
    import json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_log.json")
    entries = []
    if os.path.exists(path):
        with open(path) as fh:
            entries = json.load(fh)
    entries.append(
        {
            "round": round_no,
            "sf_dir": sf_dir,
            "utc": dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
            "queries": sorted(passed),
        }
    )
    with open(path, "w") as fh:
        json.dump(entries, fh, indent=1)
    print(f"sweep_log: recorded {len(passed)} green queries for round {round_no}")


def main() -> int:
    argv = list(sys.argv[1:])
    log_round: int | None = None
    if "--log-sweep" in argv:
        i = argv.index("--log-sweep")
        log_round = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(argv[1:]) if len(argv) > 1 else (
        set(argv) if argv and not os.path.isdir(argv[0]) else None
    )

    import __spark_entry__ as entry_mod
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"ERROR unknown queries: {sorted(unknown)}; known: {sorted(qs)}")
            return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        _warn_complex_columns(name, sdf)
        if name not in oracles:
            print(f"PASS* {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            odf.columns = [
                next(c for c in sdf.columns if c.lower() == oc.lower()) for oc in odf.columns
            ]
            hs, ho = canonical_hash(sdf), canonical_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures.append(name)
            _debug_dump(name, sdf, odf)
        else:
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if log_round is not None:
        ran = [n for n in qs if (not only or n in only)]
        _record_sweep(log_round, sf_dir, [n for n in ran if n not in failures])
    return 1 if failures else 0


def _debug_dump(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    try:
        cols = sorted(set(sdf.columns) & set(odf.columns))
        s = sdf[cols].copy()
        o = odf[cols].copy()
        s["__src"], o["__src"] = "spark", "duckdb"
        both = pd.concat([s, o])
        key = [c for c in cols]
        dup = both.drop_duplicates(subset=key, keep=False)
        if len(dup):
            print(dup.sort_values(key).head(10).to_string())
    except Exception:
        pass


if __name__ == "__main__":
    sys.exit(main())
