"""Round-12 planted behavioral tests: the q_agg_gini_approx sketch
twin's certified error bound, and the graph pair's auto-knee hot-part
cap (VERDICT r11 items 2-3).  Cross-engine tests run the Spark op AND
its DuckDB oracle on the same planted parquet under the driver's
canonicalization, so a cap rule that drifted between engines fails
loudly; the hand-computed expectations catch mirrored-on-both-engines
semantic bugs the EXACT gate cannot see."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kafka_connect_sse_spark.registry import oracle_sql, queries

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def q():
    return queries()


@pytest.fixture(scope="module")
def osql():
    return oracle_sql()


def _duck_view(sf_dir: str, table: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    return con


def _cross_engine(spark, q, osql, name, sf_dir, table):
    from tools.check_correctness import canon

    spdf = q[name](spark, sf_dir).toPandas()
    con = _duck_view(sf_dir, table)
    opdf = con.execute(osql[name]).df()
    scols, srows, shash = canon(spdf)
    ocols, orows, ohash = canon(opdf)
    assert scols == ocols, (name, scols, ocols)
    assert shash == ohash, (name, srows[:4], orows[:4])
    return spdf


def test_gini_approx_certified_within_err_bound_of_exact(spark, q):
    """The twin's whole contract: |gini_trap - gini_exact| <=
    err_bound <= GINI_TOL per group, with err_bound computed from
    EXACT bin masses (the convex-chord bound) — verified against the
    exact rank-window op at sf0.01."""
    from kafka_connect_sse_spark.operators.aggregates import (
        GINI_TOL,
        gini_approx_detail,
    )

    det = {
        r["o_orderpriority"]: r
        for r in gini_approx_detail(spark, SF001).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in q["q_agg_gini"](spark, SF001).collect()
    }
    assert set(det) == set(exact) and len(det) == 5
    for prio, a in det.items():
        e = exact[prio]
        diff = abs(a["gini_approx"] - e["gini"])
        assert diff <= a["err_bound"] <= GINI_TOL, (
            prio,
            a["gini_approx"],
            e["gini"],
            a["err_bound"],
        )
        assert a["n_orders"] == e["n_orders"]


def test_gini_approx_driver_style_gate(spark, q, osql):
    """The registered op's EXACT gate at sf0.01 (n/total exact,
    ok_gini certified TRUE), driver canonicalization."""
    spdf = _cross_engine(
        spark, q, osql, "q_agg_gini_approx", SF001, "orders"
    )
    assert spdf["ok_gini"].all()


def _write_lineitem_ps(tmp_path, rows, name):
    """rows: (l_orderkey, l_partkey, l_suppkey)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    n = len(rows)
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([1.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def _skew_catalog(tmp_path, name):
    """Part 1 = {s1, s2} (kept, pd=2); hub part 9 = {s1..s70}
    (pd=70 > the GRAPH_PD_FLOOR=64 cap when the 1/16 profile sample
    is empty/degenerate -> dropped)."""
    rows = [(1, 1, 1), (2, 1, 2)]
    ok = 3
    for s in range(1, 71):
        rows.append((ok, 9, s))
        ok += 1
    return _write_lineitem_ps(tmp_path, rows, name)


def test_jaccard_hot_part_cap_binds_and_oracle_mirrors(
    spark, tmp_path, q, osql
):
    """The hub part (70 suppliers) exceeds the cap and is dropped on
    BOTH engines: without the cap there would be C(70,2)=2415 pairs;
    with it, exactly the planted (s1,s2) pair from part 1 survives,
    and degrees count only KEPT parts (deg=1 each -> jaccard=1.0)."""
    sf = _skew_catalog(tmp_path, "sfjacskew12")
    spdf = _cross_engine(
        spark, q, osql, "q_jaccard_neighbors", sf, "lineitem"
    )
    assert len(spdf) == 1
    r = spdf.iloc[0]
    assert (r["s1"], r["s2"]) == (1, 2)
    assert (r["n_common"], r["deg1"], r["deg2"]) == (1, 1, 1)
    assert r["jaccard"] == pytest.approx(1.0)


def test_assortativity_hot_part_cap_cross_engine(
    spark, tmp_path, q, osql
):
    """Same skew catalog through assortativity: only the (s1,s2) pair
    remains, both endpoints degree 1 -> constant-degree graph ->
    NULL assortativity on BOTH engines (the degenerate guard), with
    n_directed_pairs = 2 (symmetrized)."""
    sf = _skew_catalog(tmp_path, "sfasskew12")
    spdf = _cross_engine(
        spark, q, osql, "q_graph_assortativity", sf, "lineitem"
    )
    r = spdf.iloc[0]
    assert int(r["n_directed_pairs"]) == 2
    assert r["assortativity"] is None or r["assortativity"] != r[
        "assortativity"
    ]  # NULL/NaN under either pandas rendering


def _write_documents(tmp_path, rows, name):
    """rows: (doc_id, text, lang, source)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_code_detect_hand_computed_on_braced_doc(
    spark, tmp_path, q, osql
):
    """A doc with real braces/semicolons must score code-like on BOTH
    engines (the sf0.01 corpus has no braces, so the EXACT gate alone
    would pass even if one engine counted a wrong literal — this
    planted test is the guard).  Doc 1: 'int f() { return x; }' -> 6
    tokens; braces 2, semi 1, eq 0 -> score (3*2+2*1)/6 = 8/6; doc 2
    plain prose scores 0."""
    rows = [
        (1, "int f() { return x; }", "en", "s1"),
        (2, "plain prose with no symbols at all", "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows, "sfcode12")
    spdf = _cross_engine(
        spark, q, osql, "x_code_detect", sf, "documents"
    ).set_index("doc_id")
    r1 = spdf.loc[1]
    assert (r1["n_brace"], r1["n_semi"], r1["n_eq"], r1["n_tok"]) == (
        2,
        1,
        0,
        6,
    )
    assert r1["code_score"] == pytest.approx(8 / 6, abs=1e-6)
    assert bool(r1["is_code_like"])
    r2 = spdf.loc[2]
    assert r2["code_score"] == 0.0 and not bool(r2["is_code_like"])
