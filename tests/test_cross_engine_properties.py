"""Hypothesis-randomized CROSS-ENGINE parity: Spark operator vs its own
DuckDB SQL renderer on the same randomized frame.

The oracle gate and the sweep prove Spark == DuckDB on the FIXED
testdata; the property pins prove Spark == Python on randomized inputs.
This file closes the triangle's third side for the most intricate
renderer pairs — randomized inputs through BOTH engines — so a
renderer-side edge case the fixed parquet never exercises (an md5/conv
corner, a window-frame NULL placement, a full-outer coalesce) cannot
hide behind the fixed-data gate.

Each test registers the same pandas frame as a DuckDB view and as a
Spark DataFrame, runs the operator on one side and the rendered SQL on
the other, and compares collected values exactly.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _duck(frames: dict[str, pd.DataFrame]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(f"_reg_{name}", df)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM _reg_{name}")
    return con


_srm_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 4)), min_size=1, max_size=30
)


@given(rows=_srm_rows, thr=st.integers(0, 10_000_000))
@SET
def test_srm_check_cross_engine(spark, rows, thr):
    """srm_check == srm_check_sql on ANY assignment stream and
    threshold (exact chi² numerator, truncated micro division)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        srm_check,
        srm_check_sql,
    )

    pdf = pd.DataFrame(rows, columns=["e", "v"])
    sdf = spark.createDataFrame(pdf)
    got = {
        r.experiment: (r.n, r.n_variants, r.chi2_micro, r.srm_flag)
        for r in srm_check(sdf, "e", "v", thr).collect()
    }
    con = _duck({"srctab": pdf})
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(srm_check_sql("srctab", "e", "v", thr)).fetchall()
    }
    assert got == want


_drift_vals = st.lists(st.integers(0, 2**20), min_size=1, max_size=30)


@given(old=_drift_vals, new=_drift_vals)
@SET
def test_hdr_drift_cross_engine(spark, old, new):
    """The TVD / W1 / KS drift renderers agree with the Spark operators
    on ANY two randomized samples (shared bucketing, integer CDFs)."""
    from dwh_etl_ods_spark_jobs_spark.sketches import (
        hdr_distribution_drift,
        hdr_distribution_drift_sql,
        hdr_ks_drift,
        hdr_ks_drift_sql,
        hdr_wasserstein_drift,
        hdr_wasserstein_drift_sql,
    )

    po = pd.DataFrame({"v": pd.Series(old, dtype="int64")})
    pn = pd.DataFrame({"v": pd.Series(new, dtype="int64")})
    so = spark.createDataFrame(po)
    sn = spark.createDataFrame(pn)
    con = _duck({"oldtab": po, "newtab": pn})
    octe, ncte = "SELECT * FROM oldtab", "SELECT * FROM newtab"

    for op, render in (
        (hdr_distribution_drift, hdr_distribution_drift_sql),
        (hdr_wasserstein_drift, hdr_wasserstein_drift_sql),
        (hdr_ks_drift, hdr_ks_drift_sql),
    ):
        got = [tuple(r) for r in op(so, sn, "v").collect()]
        want = [tuple(r) for r in con.execute(render(octe, ncte, "v")).fetchall()]
        assert got == want, op.__name__


_ben_vals = st.lists(
    st.one_of(st.none(), st.integers(-100, 10**6)), min_size=1, max_size=30
).filter(lambda vs: any(v is not None and v > 0 for v in vs))


@given(vals=_ben_vals)
@SET
def test_benford_audit_cross_engine(spark, vals):
    """benford_first_digit_audit == its renderer on ANY values (NULL and
    non-positive exclusion, integer ppm shares)."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        benford_first_digit_audit,
        benford_first_digit_audit_sql,
    )

    pdf = pd.DataFrame({"v": pd.Series(vals, dtype="Int64")})
    sdf = spark.createDataFrame(pdf)
    got = sorted(tuple(r) for r in benford_first_digit_audit(sdf, "v").collect())
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(benford_first_digit_audit_sql("srctab", "v")).fetchall()
    )
    assert got == want


_ck_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),
        st.one_of(st.none(), st.integers(0, 5)),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_ck_rows)
@SET
def test_table_checksum_cross_engine(spark, rows):
    """table_checksum == its renderer on ANY rows — the double-md5
    60-bit hash, XOR fold, and mod-2^63 sum all agree bit-for-bit."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        table_checksum,
        table_checksum_sql,
    )

    pdf = pd.DataFrame(rows, columns=["a", "b"]).astype("Int64")
    sdf = spark.createDataFrame(pdf)
    got = tuple(table_checksum(sdf).collect()[0])
    con = _duck({"srctab": pdf})
    want = tuple(con.execute(table_checksum_sql("srctab", ["a", "b"])).fetchall()[0])
    assert got == want


_snap_side = st.dictionaries(
    st.one_of(st.none(), st.integers(0, 6)),
    st.one_of(st.none(), st.integers(0, 3)),
    min_size=0,
    max_size=8,
)


@given(old=_snap_side, new=_snap_side)
@SET
def test_snapshot_diff_cross_engine(spark, old, new):
    """snapshot_diff == its renderer on ANY two versions — null-safe
    full-outer key matching and the fingerprint compare agree."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        snapshot_diff,
        snapshot_diff_sql,
    )

    po = pd.DataFrame(list(old.items()) or None, columns=["k", "v"]).astype("Int64")
    pn = pd.DataFrame(list(new.items()) or None, columns=["k", "v"]).astype("Int64")
    so = spark.createDataFrame(po, "k int, v int")
    sn = spark.createDataFrame(pn, "k int, v int")
    got = {
        (None if r.k is None else int(r.k)): r.change
        for r in snapshot_diff(so, sn, ["k"]).collect()
    }
    con = _duck({"oldtab": po, "newtab": pn})
    sql = snapshot_diff_sql("SELECT * FROM oldtab", "SELECT * FROM newtab", ["k"], ["v"])
    want = {
        (None if k is None else int(k)): c for k, c in con.execute(sql).fetchall()
    }
    assert got == want


@given(
    child=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=20),
    parent=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=0, max_size=10),
)
@SET
def test_fk_orphan_census_cross_engine(spark, child, parent):
    """fk_orphan_census == its renderer on ANY keysets — NULL-as-orphan
    and the truncated ppm agree."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        fk_orphan_census,
        fk_orphan_census_sql,
    )

    pc = pd.DataFrame({"fk": pd.Series(child, dtype="Int64")})
    pp = pd.DataFrame({"pk": pd.Series(parent, dtype="Int64")})
    sc = spark.createDataFrame(pc, "fk int")
    sp = spark.createDataFrame(pp, "pk int")
    got = tuple(fk_orphan_census(sc, sp, [("fk", "pk")]).collect()[0])
    con = _duck({"childtab": pc, "parenttab": pp})
    sql = fk_orphan_census_sql(
        "SELECT * FROM childtab", "SELECT pk AS fk FROM parenttab", [("fk", "fk")]
    )
    want = tuple(con.execute(sql).fetchall()[0])
    assert got == want


_ge_edges = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=25
)


@given(edges=_ge_edges, iters=st.integers(1, 4))
@SET
def test_pagerank_cross_engine(spark, edges, iters):
    """pagerank == pagerank_sql on ANY directed multigraph at ANY
    shallow iteration count — exact-integer ranks bit-for-bit."""
    from dwh_etl_ods_spark_jobs_spark.graph import pagerank, pagerank_sql

    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    sdf = spark.createDataFrame(pdf)
    got = {r.node: r.rank_micro for r in pagerank(sdf, iterations=iters).collect()}
    con = _duck({"gedges": pdf})
    want = dict(
        con.execute(
            pagerank_sql("SELECT src, dst FROM gedges", iterations=iters)
        ).fetchall()
    )
    assert got == want


_und_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@given(raw=_und_edges)
@SET
def test_triangle_census_cross_engine(spark, raw):
    """triangle_census == triangle_census_sql on ANY undirected graph —
    identical degree-ordered orientation and closing joins."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        triangle_census,
        triangle_census_sql,
    )

    eset = sorted({(min(a, b), max(a, b)) for a, b in raw})
    pdf = pd.DataFrame(eset, columns=["u", "v"])
    sdf = spark.createDataFrame(pdf)
    got = {r.node: r.n_triangles for r in triangle_census(sdf).collect()}
    con = _duck({"gedges": pdf})
    want = dict(
        con.execute(triangle_census_sql("SELECT u, v FROM gedges")).fetchall()
    )
    assert got == want


@given(raw=_und_edges, k=st.integers(1, 4), rounds=st.integers(1, 3))
@SET
def test_kcore_and_lpa_cross_engine(spark, raw, k, rounds):
    """k_core and label_propagation == their unrolled-CTE renderers on
    ANY symmetrized graph — peel fixpoint and synchronous LPA rounds
    agree row-for-row."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        k_core,
        k_core_sql,
        label_propagation,
        label_propagation_sql,
    )

    sym = sorted(
        {(a, b) for a, b in raw} | {(b, a) for a, b in raw}
    )
    pdf = pd.DataFrame(sym, columns=["src", "dst"])
    sdf = spark.createDataFrame(pdf)
    con = _duck({"gedges": pdf})
    cte = "SELECT src, dst FROM gedges"

    got_core = {r.node: r.degree for r in k_core(sdf, k=k).collect()}
    want_core = dict(con.execute(k_core_sql(cte, k=k)).fetchall())
    assert got_core == want_core

    got_lpa = {r.node: r.label for r in label_propagation(sdf, rounds=rounds).collect()}
    want_lpa = dict(
        con.execute(label_propagation_sql(cte, rounds=rounds)).fetchall()
    )
    assert got_lpa == want_lpa


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 500)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_hll_distinct_cross_engine(spark, rows):
    """hll_distinct == hll_distinct_sql on ANY grouped values — the
    register fold and the rounded estimate agree exactly."""
    from dwh_etl_ods_spark_jobs_spark.sketches import hll_distinct, hll_distinct_sql

    pdf = pd.DataFrame(rows, columns=["g", "v"])
    sdf = spark.createDataFrame(pdf)
    got = {
        r.g: (r.empty_registers, r.est_distinct)
        for r in sdf.transform(hll_distinct(["g"], "v")).collect()
    }
    con = _duck({"srctab": pdf})
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(hll_distinct_sql("srctab", ["g"], "v")).fetchall()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 2**20)),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_hdr_percentile_calibrate_cross_engine(spark, rows):
    """hdr_percentile_calibrate == its renderer on ANY grouped scores —
    bucket assignment and the strictly-below ppm agree per row."""
    from dwh_etl_ods_spark_jobs_spark.sketches import (
        hdr_percentile_calibrate,
        hdr_percentile_calibrate_sql,
    )

    pdf = pd.DataFrame(rows, columns=["g", "v"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        (r.g, r.v, r.pct_micro)
        for r in hdr_percentile_calibrate(sdf, ["g"], "v").collect()
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            hdr_percentile_calibrate_sql("srctab", ["g"], "v")
        ).fetchall()
    )
    assert got == want


@given(
    stream=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.one_of(st.none(), st.integers(0, 3))),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_changes_to_scd2_cross_engine(spark, stream):
    """changes_to_scd2 == its renderer on ANY observation stream —
    NULL-safe change points, NULLS FIRST ordering, and interval ends
    agree."""
    from dwh_etl_ods_spark_jobs_spark.operators.scd import (
        changes_to_scd2,
        changes_to_scd2_sql,
    )

    pdf = pd.DataFrame(stream, columns=["k", "ts", "a"]).astype(
        {"k": "int64", "ts": "int64", "a": "Int64"}
    )
    sdf = spark.createDataFrame(pdf, "k int, ts long, a int")
    got = sorted(
        ((r.k, r.a, r.effective_from, r.effective_to, r.is_current)
         for r in sdf.transform(changes_to_scd2("k", "ts", ["a"])).collect()),
        key=repr,
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        ((k, a, f, t, bool(c)) for k, a, f, t, c in con.execute(
            changes_to_scd2_sql("srctab", "k", "ts", ["a"])
        ).fetchall()),
        key=repr,
    )
    assert got == want


@given(weights=st.dictionaries(st.integers(0, 8), st.integers(1, 100), min_size=1, max_size=8), budget=st.integers(0, 500))
@SET
def test_largest_remainder_cross_engine(spark, weights, budget):
    """largest_remainder_allocation == its renderer on ANY weights and
    budget — floors, remainder ranks, and tie-breaks agree."""
    from dwh_etl_ods_spark_jobs_spark.curation import (
        largest_remainder_allocation,
        largest_remainder_allocation_sql,
    )

    pdf = pd.DataFrame(list(weights.items()), columns=["key", "w"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        (r.key, r.weight, r.alloc)
        for r in largest_remainder_allocation(sdf, "key", "w", budget).collect()
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            largest_remainder_allocation_sql("srctab", "key", "w", budget)
        ).fetchall()
    )
    assert got == want


@given(edges=_ge_edges, k=st.integers(1, 5), seed=st.text("xy", min_size=1, max_size=3))
@SET
def test_negative_edge_samples_cross_engine(spark, edges, k, seed):
    """negative_edge_samples == its renderer for ANY graph, draw count,
    and seed — the dense index, md5 draws, and drops agree."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        negative_edge_samples,
        negative_edge_samples_sql,
    )

    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        (r.src, r.dst, r.draw)
        for r in negative_edge_samples(sdf, "src", "dst", k=k, seed=seed).collect()
    )
    con = _duck({"gedges": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            negative_edge_samples_sql(
                "SELECT src, dst FROM gedges", "src", "dst", k, seed
            )
        ).fetchall()
    )
    assert got == want


@given(raw=_und_edges, srcs=st.sets(st.integers(0, 7), min_size=1, max_size=3), hops=st.integers(1, 4))
@SET
def test_bfs_hops_cross_engine(spark, raw, srcs, hops):
    """bfs_hops == its unrolled-CTE renderer for ANY graph, sources,
    and hop budget — frontier rounds and minimum distances agree."""
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops, bfs_hops_sql

    sym = sorted({(a, b) for a, b in raw} | {(b, a) for a, b in raw})
    pe = pd.DataFrame(sym, columns=["src", "dst"])
    ps = pd.DataFrame({"node": sorted(srcs)})
    se = spark.createDataFrame(pe, "src long, dst long")
    ss = spark.createDataFrame(ps, "node long")
    got = sorted(
        (r.node, r.hops) for r in bfs_hops(se, ss, max_hops=hops).collect()
    )
    con = _duck({"gedges": pe, "gsrcs": ps})
    want = sorted(
        tuple(r)
        for r in con.execute(
            bfs_hops_sql(
                "SELECT src, dst FROM gedges", "SELECT node FROM gsrcs", hops
            )
        ).fetchall()
    )
    assert got == want


_docs = st.lists(st.text("ab c.X2", min_size=0, max_size=20), min_size=1, max_size=8)


@given(texts=_docs)
@SET
def test_simhash_cross_engine(spark, texts):
    """simhash_signatures == simhash_sql on ANY corpus — per-token
    hashes, bit votes, and the signature fold agree."""
    from dwh_etl_ods_spark_jobs_spark.dedup import simhash_signatures, simhash_sql

    pdf = pd.DataFrame([(i, t) for i, t in enumerate(texts)], columns=["id", "text"])
    sdf = spark.createDataFrame(pdf)
    got = {r.doc_id: r.simhash for r in simhash_signatures(sdf, "text", "id").collect()}
    con = _duck({"srctab": pdf})
    want = dict(con.execute(simhash_sql("srctab", "text", "id")).fetchall())
    assert got == want


@given(texts=_docs, max_df=st.one_of(st.none(), st.integers(1, 6)))
@SET
def test_token_pmi_cross_engine(spark, texts, max_df):
    """token_pmi == token_pmi_sql on ANY corpus and DF window — counts
    and the single-op float ln sequence agree."""
    from dwh_etl_ods_spark_jobs_spark.curation import token_pmi, token_pmi_sql

    pdf = pd.DataFrame([(i, t) for i, t in enumerate(texts)], columns=["id", "text"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        tuple(r)
        for r in token_pmi(sdf, "text", "id", min_df=1, max_df=max_df).collect()
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            token_pmi_sql("srctab", "text", "id", min_df=1, max_df=max_df)
        ).fetchall()
    )
    assert got == want


@given(raw=_und_edges)
@SET
def test_adamic_adar_cross_engine(spark, raw):
    """adamic_adar_topk == its renderer on ANY undirected graph — the
    capped wedge domain, micro weights, and top-k cut agree."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        adamic_adar_topk,
        adamic_adar_topk_sql,
    )

    eset = sorted({(min(a, b), max(a, b)) for a, b in raw})
    pdf = pd.DataFrame(eset, columns=["u", "v"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        tuple(r) for r in adamic_adar_topk(sdf, top_k=10).collect()
    )
    con = _duck({"gedges": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            adamic_adar_topk_sql("SELECT u, v FROM gedges", top_k=10)
        ).fetchall()
    )
    assert got == want


@given(texts=_docs, thr=st.sampled_from([200_000, 500_000, 900_000]))
@SET
def test_prefix_filter_jaccard_cross_engine(spark, texts, thr):
    """prefix_filter_jaccard_pairs == its renderer on ANY corpus and
    threshold — the SAME prefix-filtered candidate generation on both
    engines, not a shortcut oracle."""
    from dwh_etl_ods_spark_jobs_spark.dedup import (
        prefix_filter_jaccard_pairs,
        prefix_filter_jaccard_pairs_sql,
    )

    pdf = pd.DataFrame([(i, t) for i, t in enumerate(texts)], columns=["id", "text"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        tuple(r)
        for r in prefix_filter_jaccard_pairs(sdf, "text", "id", threshold_ppm=thr).collect()
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            prefix_filter_jaccard_pairs_sql("srctab", "text", "id", thr)
        ).fetchall()
    )
    assert got == want


@given(
    recs=st.lists(
        st.tuples(st.integers(0, 40), st.one_of(st.none(), st.text("abcd", min_size=0, max_size=5))),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    window=st.integers(1, 4),
    max_d=st.one_of(st.none(), st.integers(0, 3)),
)
@SET
def test_sorted_neighborhood_cross_engine(spark, recs, window, max_d):
    """sorted_neighborhood_pairs == its renderer on ANY keys — the
    (key, id) total order, window joins, and Levenshtein scores agree."""
    from dwh_etl_ods_spark_jobs_spark.dedup import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_pairs_sql,
    )

    pdf = pd.DataFrame(recs, columns=["id", "k"])
    sdf = spark.createDataFrame(pdf, "id int, k string")
    got = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            sdf, "id", "k", window=window, max_distance=max_d
        ).collect()
    )
    con = _duck({"srctab": pdf})
    want = sorted(
        tuple(r)
        for r in con.execute(
            sorted_neighborhood_pairs_sql(
                "srctab", "id", "k", window=window, max_distance=max_d
            )
        ).fetchall()
    )
    assert got == want
