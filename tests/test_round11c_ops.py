"""Round-11 session-3 continuation: planted behavioral tests for the
statistics batch (q_agg_cohens_d, q_agg_gini, q_agg_wilcoxon_signed,
q_ts_acf_multi).  Each test runs the Spark op AND its DuckDB oracle on
the same planted parquet under the driver's canonicalization — the
hand-computed expectations catch mirrored-on-both-engines semantic
bugs the EXACT gate cannot see (the Cramér's V / Tukey-fence lesson
from earlier in the round)."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kafka_connect_sse_spark.registry import oracle_sql, queries


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


def _write_events(tmp_path, rows, name):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def _write_orders(tmp_path, rows, name):
    """rows: (o_orderkey, o_orderpriority, o_totalprice)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [r[2] for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [r[1] for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "orders.parquet"))
    return sf_dir


def test_cohens_d_hand_computed_pooled_sd(spark, tmp_path, q, osql):
    """purchase [10, 14] vs view [4, 8]: both sample variances are 8,
    pooled SD sqrt(8), d = 6/sqrt(8); Hedges J = 1 - 3/7."""
    rows = [
        (1, "2024-01-01T10:00:00", 1, "purchase", 10.0),
        (2, "2024-01-01T11:00:00", 2, "purchase", 14.0),
        (3, "2024-01-01T12:00:00", 3, "view", 4.0),
        (4, "2024-01-01T13:00:00", 4, "view", 8.0),
    ]
    sf = _write_events(tmp_path, rows, "sfcd11")
    r = _cross_engine(
        spark, q, osql, "q_agg_cohens_d", sf, "events"
    ).iloc[0]
    d = 6 / math.sqrt(8)
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["mean_a"] == pytest.approx(12.0)
    assert r["mean_b"] == pytest.approx(6.0)
    assert r["cohens_d"] == pytest.approx(d, abs=1e-6)
    assert r["hedges_g"] == pytest.approx(d * (1 - 3 / 7), abs=1e-6)


def test_cohens_d_constant_cohorts_yield_null(spark, tmp_path, q, osql):
    """Zero pooled variance (all values identical) must be NULL on
    both engines — the degenerate-division guard class."""
    rows = [
        (1, "2024-01-01T10:00:00", 1, "purchase", 5.0),
        (2, "2024-01-01T11:00:00", 2, "purchase", 5.0),
        (3, "2024-01-01T12:00:00", 3, "view", 5.0),
        (4, "2024-01-01T13:00:00", 4, "view", 5.0),
    ]
    sf = _write_events(tmp_path, rows, "sfcd11n")
    r = _cross_engine(
        spark, q, osql, "q_agg_cohens_d", sf, "events"
    ).iloc[0]
    assert r["cohens_d"] is None or (
        isinstance(r["cohens_d"], float) and math.isnan(r["cohens_d"])
    )


def test_gini_equal_values_zero_single_holder_three_quarters(
    spark, tmp_path, q, osql
):
    """[5,5,5,5] -> G=0; [0,0,0,10] -> G=(2*40-5*10)/(4*10)=0.75."""
    rows = [(k, "EQ", 5.0) for k in range(1, 5)]
    rows += [(k, "ONE", 0.0) for k in range(5, 8)]
    rows.append((8, "ONE", 10.0))
    sf = _write_orders(tmp_path, rows, "sfgini11")
    spdf = _cross_engine(
        spark, q, osql, "q_agg_gini", sf, "orders"
    ).set_index("o_orderpriority")
    assert spdf.loc["EQ", "gini"] == pytest.approx(0.0, abs=1e-9)
    assert spdf.loc["ONE", "gini"] == pytest.approx(0.75, abs=1e-9)
    assert spdf.loc["EQ", "total_value"] == pytest.approx(20.0)


def test_wilcoxon_hand_computed_with_and_without_ties(
    spark, tmp_path, q, osql
):
    """Diffs +1,+2,+3,-4 cents: ranks 1..4, W+=6, n=4,
    z=(6-5)/sqrt(7.5)."""
    rows, eid = [], 0
    for u, (p, c) in enumerate(
        [(1.01, 1.00), (1.02, 1.00), (1.03, 1.00), (0.96, 1.00)], 1
    ):
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", u, "purchase", p))
        eid += 1
        rows.append((eid, "2024-01-01T11:00:00", u, "click", c))
    sf = _write_events(tmp_path, rows, "sfwx11")
    r = _cross_engine(
        spark, q, osql, "q_agg_wilcoxon_signed", sf, "events"
    ).iloc[0]
    assert r["n"] == 4
    assert r["w_plus"] == pytest.approx(6.0)
    assert r["wilcoxon_z"] == pytest.approx(
        1 / math.sqrt(7.5), abs=1e-6
    )


def test_wilcoxon_tie_correction_exact(spark, tmp_path, q, osql):
    """Diffs +1,+1,-1: tie-averaged rank 2 each, W+=4, n=3,
    Var = 3*4*7/24 - (3^3-3)/48 = 3.0, z = 1/sqrt(3)."""
    rows, eid = [], 0
    for u, (p, c) in enumerate(
        [(1.01, 1.00), (2.01, 2.00), (0.99, 1.00)], 1
    ):
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", u, "purchase", p))
        eid += 1
        rows.append((eid, "2024-01-01T11:00:00", u, "click", c))
    sf = _write_events(tmp_path, rows, "sfwxt11")
    r = _cross_engine(
        spark, q, osql, "q_agg_wilcoxon_signed", sf, "events"
    ).iloc[0]
    assert r["n"] == 3
    assert r["w_plus"] == pytest.approx(4.0)
    assert r["wilcoxon_z"] == pytest.approx(
        1 / math.sqrt(3.0), abs=1e-6
    )


def test_wilcoxon_users_missing_a_side_and_zero_diffs_drop(
    spark, tmp_path, q, osql
):
    """A purchase-only user and an exactly-tied user contribute no
    pair; only the one real diff remains (z is NULL at n=1? no —
    Var>0 at n=1, z = (W+-0.5)/sqrt(...) well-defined)."""
    rows = [
        (1, "2024-01-01T10:00:00", 1, "purchase", 9.99),
        (2, "2024-01-01T10:00:00", 2, "purchase", 2.00),
        (3, "2024-01-01T11:00:00", 2, "click", 2.00),
        (4, "2024-01-01T10:00:00", 3, "purchase", 3.50),
        (5, "2024-01-01T11:00:00", 3, "click", 3.00),
    ]
    sf = _write_events(tmp_path, rows, "sfwxd11")
    r = _cross_engine(
        spark, q, osql, "q_agg_wilcoxon_signed", sf, "events"
    ).iloc[0]
    assert r["n"] == 1
    assert r["w_plus"] == pytest.approx(1.0)


def test_acf_alternating_series_lag_signs(spark, tmp_path, q, osql):
    """Daily counts 1,2,1,2,... over 8 days: hand-computed
    r1 = -0.875, r2 = 0.75 (global-mean, observed-pairs convention)."""
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i, c in enumerate([1, 2, 1, 2, 1, 2, 1, 2]):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfacf11")
    spdf = _cross_engine(
        spark, q, osql, "q_ts_acf_multi", sf, "events"
    ).set_index("lag")
    assert spdf.loc[1, "acf"] == pytest.approx(-0.875, abs=1e-9)
    assert spdf.loc[2, "acf"] == pytest.approx(0.75, abs=1e-9)
    assert int(spdf.loc[1, "n_pairs"]) == 7
    assert int(spdf.loc[7, "n_pairs"]) == 1
    assert int(spdf.loc[1, "n_days"]) == 8


def test_acf_constant_series_yields_null(spark, tmp_path, q, osql):
    """Zero variance -> NULL acf at every lag, on both engines."""
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i in range(6):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(3):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfacfc11")
    spdf = _cross_engine(
        spark, q, osql, "q_ts_acf_multi", sf, "events"
    )
    assert spdf["acf"].isna().all()


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


def test_jaccard_neighbors_hand_computed_overlap(
    spark, tmp_path, q, osql
):
    """s1={1,2,3}, s2={2,3,4} (duplicated rows must collapse),
    s3={9}: one pair (s1,s2) with jaccard 2/4; s3 pairs with no one."""
    rows = [
        (1, 1, 1), (2, 2, 1), (3, 3, 1),
        (4, 2, 2), (5, 3, 2), (6, 4, 2), (7, 2, 2),
        (8, 9, 3),
    ]
    sf = _write_lineitem_ps(tmp_path, rows, "sfjac11")
    spdf = _cross_engine(
        spark, q, osql, "q_jaccard_neighbors", sf, "lineitem"
    )
    assert len(spdf) == 1
    r = spdf.iloc[0]
    assert (r["s1"], r["s2"]) == (1, 2)
    assert (r["n_common"], r["deg1"], r["deg2"]) == (2, 3, 3)
    assert r["jaccard"] == pytest.approx(0.5)


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


def test_ttr_segments_hand_computed_msttr(spark, tmp_path, q, osql):
    """20-token doc: segment 1 has 10 distinct types, segment 2 is
    one word repeated -> msttr = (10+1)/20 = 0.55; a 15-token doc
    drops its 5-token tail; a 9-token doc contributes nothing."""
    d0 = " ".join([f"w{i}" for i in range(10)] + ["rep"] * 10)
    d1 = " ".join(["a", "b"] * 5 + ["x", "y", "z", "x", "y"])
    d2 = "short doc with under ten tokens only here now"
    rows = [
        (0, d0, "en", "s0"),
        (1, d1, "en", "s1"),
        (2, d2, "en", "s2"),
    ]
    sf = _write_documents(tmp_path, rows, "sfttr11")
    spdf = _cross_engine(
        spark, q, osql, "x_ttr_segments", sf, "documents"
    ).set_index("source")
    assert int(spdf.loc["s0", "n_segments"]) == 2
    assert spdf.loc["s0", "msttr"] == pytest.approx(0.55)
    assert int(spdf.loc["s1", "n_segments"]) == 1
    assert int(spdf.loc["s1", "sum_types"]) == 2
    assert "s2" not in spdf.index


def _write_embeddings(tmp_path, rows, name):
    """rows: (vec_id, list[float], label)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_kmeans_lloyd_separates_planted_blobs(spark, tmp_path, q, osql):
    """Four tight blobs, each built AROUND one of the four md5-ranked
    seed ids (computed the same way the op picks them), so 2 Lloyd
    iterations must land 3 members per cluster with near-zero
    inertia and centroid_norm ~ 0.4."""
    import hashlib

    ids = list(range(100, 112))
    seeds = sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:4]
    others = [v for v in ids if v not in seeds]
    rows = []
    for corner, s in enumerate(seeds):
        base = [0.0, 0.0, 0.0, 0.0]
        base[corner] = 0.4
        rows.append((s, list(base), corner))
        for k in range(2):
            m = list(base)
            m[(corner + 1) % 4] += 0.01 * (k + 1)
            rows.append((others.pop(), m, corner))
    sf = _write_embeddings(tmp_path, rows, "sfkm11")
    spdf = _cross_engine(
        spark, q, osql, "x_kmeans_lloyd", sf, "embeddings"
    )
    assert len(spdf) == 4
    assert sorted(spdf["n_members"]) == [3, 3, 3, 3]
    assert (spdf["inertia"] < 0.01).all()
    for v in spdf["centroid_norm"]:
        assert v == pytest.approx(0.4, abs=0.05)


def test_stream_topk_per_window_ranks(spark, tmp_path, q, osql):
    """Hour 1: A x3, B x2, C x1 -> top2 A,B; hour 2: C x5, A x1 ->
    top2 C,A."""
    rows, eid = [], 0
    for t, n in (("view", 3), ("click", 2), ("error", 1)):
        for _ in range(n):
            eid += 1
            rows.append((eid, "2024-01-01T10:15:00", 1, t, 1.0))
    for t, n in (("error", 5), ("view", 1)):
        for _ in range(n):
            eid += 1
            rows.append((eid, "2024-01-01T11:45:00", 1, t, 1.0))
    sf = _write_events(tmp_path, rows, "sftk11")
    spdf = _cross_engine(
        spark, q, osql, "s_topk_per_window", sf, "events"
    ).sort_values(["win_start", "rank"])
    assert list(spdf["event_type"]) == ["view", "click", "error", "view"]
    assert list(spdf["rank"]) == [1, 2, 1, 2]
    assert list(spdf["n"]) == [3, 2, 5, 1]


def _hw_replica(xs):
    """Independent replica of the quantized Holt-Winters fold (micro
    units, half-away-from-zero integer rounding)."""

    def r0(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    S = 1_000_000
    l = [x * S for x in xs]
    lv = r0(sum(l[0:7]) / 7)
    tr = r0((sum(l[7:14]) - sum(l[0:7])) / 49)
    s = [r0(x - lv) for x in l[0:7]]
    cnt = 7
    for x in l[14:]:
        slot = cnt % 7
        new_lv = r0(0.5 * (x - s[slot]) + 0.5 * (lv + tr))
        new_tr = r0(0.25 * (new_lv - lv) + 0.75 * tr)
        s[slot] = r0(0.25 * (x - new_lv) + 0.75 * s[slot])
        lv, tr, cnt = new_lv, new_tr, cnt + 1
    slot = cnt % 7
    return lv / S, tr / S, s[slot] / S


def test_holt_winters_flat_series_is_fixed_point(
    spark, tmp_path, q, osql
):
    """A constant series: level = the constant, trend = 0, every
    seasonal index 0, forecast = the constant — exactly."""
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i in range(21):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(10):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfhwf11")
    r = _cross_engine(
        spark, q, osql, "q_ts_holt_winters", sf, "events"
    ).iloc[0]
    assert r["level"] == pytest.approx(10.0, abs=1e-9)
    assert r["trend"] == pytest.approx(0.0, abs=1e-9)
    assert r["seasonal_next"] == pytest.approx(0.0, abs=1e-9)
    assert r["forecast_1"] == pytest.approx(10.0, abs=1e-9)


def test_holt_winters_matches_independent_replica(
    spark, tmp_path, q, osql
):
    """Weekly spike pattern over 4 weeks: the engine fold must equal
    a from-scratch python replica of the quantized recurrence — a
    THIRD implementation, so a mirrored Spark/DuckDB bug still
    fails."""
    counts = [(17 if i % 7 == 2 else 10) + i // 7 for i in range(28)]
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i, c in enumerate(counts):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfhwr11")
    r = _cross_engine(
        spark, q, osql, "q_ts_holt_winters", sf, "events"
    ).iloc[0]
    lv, tr, s_next = _hw_replica([float(c) for c in counts])
    assert r["level"] == pytest.approx(lv, abs=1e-9)
    assert r["trend"] == pytest.approx(tr, abs=1e-9)
    assert r["seasonal_next"] == pytest.approx(s_next, abs=1e-9)


def test_bootstrap_ci_constant_sample_degenerates(
    spark, tmp_path, q, osql
):
    """All orders the same price: every replicate mean equals it, so
    est = lo = hi and se = 0."""
    rows = [(k, "1-URGENT", 42.5) for k in range(1, 31)]
    sf = _write_orders(tmp_path, rows, "sfbc11")
    r = _cross_engine(
        spark, q, osql, "q_agg_bootstrap_ci", sf, "orders"
    ).iloc[0]
    assert r["n_orders"] == 30
    assert r["est_mean"] == pytest.approx(42.5)
    assert r["boot_lo"] == pytest.approx(42.5)
    assert r["boot_hi"] == pytest.approx(42.5)
    assert r["boot_se"] == pytest.approx(0.0, abs=1e-9)


def test_bootstrap_ci_brackets_point_estimate(spark, tmp_path, q, osql):
    """Mixed prices: identity replicate reproduces the exact mean and
    the rank CI brackets it."""
    prices = [10.0, 20.0, 30.0, 40.0, 100.0, 15.0, 25.0, 35.0]
    rows = [(k, "1-URGENT", p) for k, p in enumerate(prices, 1)]
    sf = _write_orders(tmp_path, rows, "sfbc11b")
    r = _cross_engine(
        spark, q, osql, "q_agg_bootstrap_ci", sf, "orders"
    ).iloc[0]
    assert r["est_mean"] == pytest.approx(sum(prices) / len(prices))
    assert r["boot_lo"] <= r["est_mean"] <= r["boot_hi"]
    assert r["boot_se"] > 0


def test_shard_manifest_replicates_hash_assignment(
    spark, tmp_path, q, osql
):
    """Shard ids and the order-free checksum must equal a hashlib
    replica."""
    import hashlib

    rows = [
        (i, f"tok{i} tok{i + 1} tok{i + 2}", "en", f"s{i % 2}")
        for i in range(20)
    ]
    sf = _write_documents(tmp_path, rows, "sfsm11")
    spdf = _cross_engine(
        spark, q, osql, "x_shard_manifest", sf, "documents"
    ).set_index("shard")
    exp = {}
    for i, text, _, _ in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        e = exp.setdefault(h % 8, [0, 0, 0])
        e[0] += 1
        e[1] += len(text.split())
        e[2] += h
    assert set(spdf.index) == set(exp)
    for shard, (n, toks, chk) in exp.items():
        assert int(spdf.loc[shard, "n_docs"]) == n
        assert int(spdf.loc[shard, "n_tokens"]) == toks
        assert int(spdf.loc[shard, "content_checksum"]) == chk
    assert int(spdf["n_docs"].sum()) == 20


def test_decompose_ma_flat_with_monday_spike(spark, tmp_path, q, osql):
    """Constant 10 with +7 every Monday over 3 weeks: the Monday
    seasonal index is positive, flat days negative, and a replica of
    the 7x-detrended arithmetic agrees exactly."""
    base = dt.date(2024, 1, 1)  # a Monday
    counts = [
        10 + (7 if (base + dt.timedelta(days=i)).isoweekday() == 1
              else 0)
        for i in range(21)
    ]
    rows, eid = [], 0
    for i, c in enumerate(counts):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfdm11")
    spdf = _cross_engine(
        spark, q, osql, "q_ts_decompose_ma", sf, "events"
    ).set_index("dow")
    # replica: full centered windows exist for days 4..18 (1-based)
    exp = {}
    for t in range(3, 18):
        s7 = sum(counts[t - 3:t + 4])
        det7 = 7 * counts[t] - s7
        dow = (base + dt.timedelta(days=t)).isoweekday()
        exp.setdefault(dow, []).append(det7)
    for dow, dets in exp.items():
        assert spdf.loc[dow, "seasonal"] == pytest.approx(
            sum(dets) / (7 * len(dets)), abs=1e-6
        )
    assert spdf.loc[1, "seasonal"] > 5  # Monday spike
    assert (spdf.drop(index=1)["seasonal"] < 0).all()


def test_mutual_info_dependent_and_entropy_equalities(
    spark, tmp_path, q, osql
):
    """Each type occurs on exactly one distinct weekday with equal
    mass: MI = H(type) = H(dow) = ln 3 and U = 1."""
    rows, eid = [], 0
    # 2024-01-01 Mon, 01-02 Tue, 01-03 Wed
    for day, t in (
        ("2024-01-01", "view"),
        ("2024-01-02", "click"),
        ("2024-01-03", "purchase"),
    ):
        for _ in range(4):
            eid += 1
            rows.append((eid, f"{day}T10:00:00", 1, t, 1.0))
    sf = _write_events(tmp_path, rows, "sfmi11")
    r = _cross_engine(
        spark, q, osql, "q_agg_mutual_info", sf, "events"
    ).iloc[0]
    assert r["h_type"] == pytest.approx(math.log(3), abs=1e-6)
    assert r["h_dow"] == pytest.approx(math.log(3), abs=1e-6)
    assert r["mi"] == pytest.approx(math.log(3), abs=1e-6)
    assert r["uncertainty_coef"] == pytest.approx(1.0, abs=1e-6)


def test_mutual_info_independent_is_zero(spark, tmp_path, q, osql):
    """Two types uniformly spread over the same two weekdays: MI = 0."""
    rows, eid = [], 0
    for day in ("2024-01-01", "2024-01-02"):
        for t in ("view", "click"):
            for _ in range(3):
                eid += 1
                rows.append((eid, f"{day}T10:00:00", 1, t, 1.0))
    sf = _write_events(tmp_path, rows, "sfmi11i")
    r = _cross_engine(
        spark, q, osql, "q_agg_mutual_info", sf, "events"
    ).iloc[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-6)
    assert r["uncertainty_coef"] == pytest.approx(0.0, abs=1e-6)


def _phash_replica(doc_id):
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    cells = {}
    for y in range(4):
        for x in range(4):
            gy, gx = (y * h) // 4, (x * w) // 4
            g = sum(
                (doc_id * 7 + 13 * (3 * (gy * w + gx) + c)) % 256
                for c in range(3)
            )
            cells[y * 4 + x] = g
    tot = sum(cells.values())
    return sum(1 << k for k, g in cells.items() if 16 * g > tot)


def test_multimodal_phash_matches_replica_and_buckets(
    spark, tmp_path, q, osql
):
    """Hashes must equal a from-scratch python replica; doc ids with
    the same (dims, pixel pattern) collide into one bucket."""
    rows = [(i, "irrelevant text", "en", "s0") for i in range(60)]
    sf = _write_documents(tmp_path, rows, "sfph11")
    spdf = _cross_engine(
        spark, q, osql, "x_multimodal_phash", sf, "documents"
    )
    img_ids = [i for i in range(60) if i % 4 == 1]
    exp = {}
    for i in img_ids:
        exp.setdefault(_phash_replica(i), []).append(i)
    assert int(spdf["n_images"].sum()) == len(img_ids)
    got = {int(r["phash"]): int(r["n_images"]) for _, r in spdf.iterrows()}
    assert got == {h: len(ids) for h, ids in exp.items()}


def _write_supplier(tmp_path, sf_dir, rows):
    """rows: (s_suppkey, s_nationkey); writes into an existing dir."""
    tbl = pa.table(
        {
            "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "s_name": pa.array(
                [f"sup{r[0]}" for r in rows], pa.string()
            ),
            "s_nationkey": pa.array([r[1] for r in rows], pa.int64()),
            "s_acctbal": pa.array([0.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "supplier.parquet"))
    return sf_dir


def test_interval_overlap_hand_computed(spark, tmp_path, q, osql):
    """s1 [Jan1,Jan10] and s2 [Jan5,Feb1] overlap 6 days; s3 [Mar1,
    Mar2] overlaps nobody; s4 overlaps s1 but sits in another
    nation."""
    li = []

    def ship(orderkey, supp, day):
        li.append((orderkey, 1, supp, day))

    ship(1, 1, "2024-01-01"); ship(2, 1, "2024-01-10")
    ship(3, 2, "2024-01-05"); ship(4, 2, "2024-02-01")
    ship(5, 3, "2024-03-01"); ship(6, 3, "2024-03-02")
    ship(7, 4, "2024-01-02"); ship(8, 4, "2024-01-09")
    sf_dir = str(tmp_path / "sfio11")
    os.makedirs(sf_dir, exist_ok=True)
    n = len(li)
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
            "l_partkey": pa.array([r[1] for r in li], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([1.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime.fromisoformat(r[3] + "T00:00:00")
                 for r in li],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    _write_supplier(tmp_path, sf_dir, [(1, 7), (2, 7), (3, 7), (4, 8)])
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    from tools.check_correctness import canon

    spdf = q["q_join_interval_overlap"](spark, sf_dir).toPandas()
    opdf = con.execute(osql["q_join_interval_overlap"]).df()
    assert canon(spdf)[2] == canon(opdf)[2]
    assert len(spdf) == 1
    r = spdf.iloc[0]
    assert r["nation"] == 7
    assert r["n_overlapping_pairs"] == 1
    assert r["total_overlap_days"] == 6


def test_threshold_alert_fires_on_planted_spike(spark, tmp_path, q, osql):
    """10 quiet hours (1 event) plus one 10-event spike: mean = 20/11,
    only the spike exceeds 2x mean; times_mean = 110/20."""
    rows, eid = [], 0
    for hr in range(10):
        eid += 1
        rows.append((eid, f"2024-01-01T{hr:02d}:05:00", 1, "view", 1.0))
    for _ in range(10):
        eid += 1
        rows.append((eid, "2024-01-01T12:30:00", 1, "view", 1.0))
    sf = _write_events(tmp_path, rows, "sfta11")
    spdf = _cross_engine(
        spark, q, osql, "s_threshold_alert", sf, "events"
    )
    assert len(spdf) == 1
    r = spdf.iloc[0]
    assert r["n"] == 10
    assert r["times_mean"] == pytest.approx(5.5)
    assert r["win_start"].startswith("2024-01-01 12:")


def test_snapshot_diff_hand_computed_classes(spark, tmp_path, q, osql):
    """Keys 1..12 at 1.00: A drops k%4==1, B drops k%4==2 and bumps
    +10.00 where k%3==0 -> 3 inserts {1,5,9}, 3 deletes {2,6,10},
    2 updates {3,12}, 4 unchanged."""
    rows = [(k, "1-URGENT", 1.0) for k in range(1, 13)]
    sf = _write_orders(tmp_path, rows, "sfsd11")
    spdf = _cross_engine(
        spark, q, osql, "q_snapshot_diff", sf, "orders"
    ).set_index("op")
    assert int(spdf.loc["insert", "n_keys"]) == 3
    assert int(spdf.loc["delete", "n_keys"]) == 3
    assert int(spdf.loc["update", "n_keys"]) == 2
    assert int(spdf.loc["unchanged", "n_keys"]) == 4
    assert int(spdf.loc["insert", "net_cents_delta"]) == 300 + 1000
    assert int(spdf.loc["delete", "net_cents_delta"]) == -300
    assert int(spdf.loc["update", "net_cents_delta"]) == 2000
    assert int(spdf.loc["unchanged", "net_cents_delta"]) == 0


def test_assortativity_star_graph_is_minus_one(spark, tmp_path, q, osql):
    """Hub supplier s0 shares each of 4 parts with a distinct leaf:
    every edge joins degree 4 to degree 1 -> r = -1 exactly."""
    rows, ok = [], 0
    for p in range(1, 5):
        ok += 1
        rows.append((ok, p, 100))
        ok += 1
        rows.append((ok, p, 100 + p))
    sf = _write_lineitem_ps(tmp_path, rows, "sfas11")
    r = _cross_engine(
        spark, q, osql, "q_graph_assortativity", sf, "lineitem"
    ).iloc[0]
    assert int(r["n_directed_pairs"]) == 8
    assert r["assortativity"] == pytest.approx(-1.0, abs=1e-9)


def test_asof_tolerance_staleness_boundary(spark, tmp_path, q, osql):
    """Signup at 00:00; event at +1h matches (lag 3600); event at
    +30h is STALE (24h tolerance) -> no match despite a past signup."""
    rows = [
        (1, "2024-01-01T00:00:00", 7, "signup", 0.0),
        (2, "2024-01-01T01:00:00", 7, "view", 1.0),
        (3, "2024-01-02T06:00:00", 7, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows, "sfat11")
    spdf = _cross_engine(
        spark, q, osql, "q_join_asof_tolerance", sf, "events"
    ).set_index("event_id")
    assert spdf.loc[2, "asof_lag_s"] == 3600
    assert spdf.loc[2, "asof_signup_ts"] == "2024-01-01 00:00:00"
    assert spdf.loc[3, "asof_signup_ts"] is None or (
        isinstance(spdf.loc[3, "asof_signup_ts"], float)
    )
    assert spdf.loc[1, "asof_lag_s"] == 0


def test_anova_hand_computed_f(spark, tmp_path, q, osql):
    """Groups [1,2,3], [4,5,6], [7,8,9]: SSB=54, SSW=6, F=27."""
    rows, eid = [], 0
    for t, vals in (
        ("view", [1, 2, 3]),
        ("click", [4, 5, 6]),
        ("purchase", [7, 8, 9]),
    ):
        for x in vals:
            eid += 1
            rows.append(
                (eid, "2024-01-01T10:00:00", eid, t, float(x))
            )
    sf = _write_events(tmp_path, rows, "sfan11")
    r = _cross_engine(
        spark, q, osql, "q_agg_anova_oneway", sf, "events"
    ).iloc[0]
    assert r["n_groups"] == 3 and r["n_obs"] == 9
    assert r["anova_f"] == pytest.approx(27.0, abs=1e-6)


def test_anova_identical_groups_f_zero(spark, tmp_path, q, osql):
    """Same values in every group -> SSB = 0 -> F = 0."""
    rows, eid = [], 0
    for t in ("view", "click"):
        for x in (1.0, 2.0):
            eid += 1
            rows.append((eid, "2024-01-01T10:00:00", eid, t, x))
    sf = _write_events(tmp_path, rows, "sfan11z")
    r = _cross_engine(
        spark, q, osql, "q_agg_anova_oneway", sf, "events"
    ).iloc[0]
    assert r["anova_f"] == pytest.approx(0.0, abs=1e-9)


def test_levene_hand_computed_w(spark, tmp_path, q, osql):
    """A=[1,1,3,3] (lower median 1, |z|=0,0,2,2) vs B=[2,2,2,2]
    (z=0): W = (2/1)/(4/6) = 3."""
    rows, eid = [], 0
    for x in (1.0, 1.0, 3.0, 3.0):
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", eid, "view", x))
    for x in (2.0, 2.0, 2.0, 2.0):
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", eid, "click", x))
    sf = _write_events(tmp_path, rows, "sflv11")
    r = _cross_engine(
        spark, q, osql, "q_agg_levene", sf, "events"
    ).iloc[0]
    assert r["n_groups"] == 2 and r["n_obs"] == 8
    assert r["levene_w"] == pytest.approx(3.0, abs=1e-6)


def _write_orders_full(tmp_path, rows, name):
    """rows: (o_orderkey, o_custkey, o_orderpriority, o_totalprice,
    o_orderdate_iso)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [r[3] for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime.fromisoformat(r[4]) for r in rows],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [r[2] for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "orders.parquet"))
    return sf_dir


def test_data_contract_counts_planted_violations(
    spark, tmp_path, q, osql
):
    """One duplicate key, one negative price, one out-of-domain
    priority, one out-of-range date, one non-positive custkey —
    each check counts exactly its own violation."""
    good = "2024-01-01T00:00:00"
    rows = [
        (1, 1, "1-URGENT", 10.0, good),
        (1, 2, "2-HIGH", 10.0, good),          # dup key
        (2, 3, "3-MEDIUM", -5.0, good),        # negative price
        (3, 4, "9-BOGUS", 10.0, good),         # bad domain
        (4, 5, "5-LOW", 10.0, "1980-01-01T00:00:00"),  # bad date
        (5, 0, "4-NOT SPECIFIED", 10.0, good),  # custkey <= 0
        (6, 6, "1-URGENT", 10.0, good),
    ]
    sf = _write_orders_full(tmp_path, rows, "sfdc11c")
    spdf = _cross_engine(
        spark, q, osql, "x_data_contract", sf, "orders"
    ).set_index("check_name")
    assert int(spdf.loc["orderkey_unique", "n_violations"]) == 1
    assert int(spdf.loc["totalprice_nonnegative", "n_violations"]) == 1
    assert int(spdf.loc["priority_in_domain", "n_violations"]) == 1
    assert int(spdf.loc["orderdate_in_range", "n_violations"]) == 1
    assert int(spdf.loc["custkey_positive", "n_violations"]) == 1
    assert int(spdf.loc["priority_not_null", "n_violations"]) == 0
    assert not spdf.loc["orderkey_unique", "passed"]
    assert spdf.loc["priority_not_null", "passed"]


def test_psi_identical_periods_zero_shifted_large(
    spark, tmp_path, q, osql
):
    """Same value multiset in an even and an odd ISO week -> PSI = 0
    exactly (equal smoothed masses); B shifted wholly into the top
    bin -> PSI > 0.25 (the 'shifted' alarm band)."""
    vals = [float(x) for x in range(1, 21)]
    rows, eid = [], 0
    for x in vals:  # week 1 (odd) = period B
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", eid, "view", x))
    for x in vals:  # week 2 (even) = period A
        eid += 1
        rows.append((eid, "2024-01-08T10:00:00", eid, "view", x))
    sf = _write_events(tmp_path, rows, "sfpsi11")
    r = _cross_engine(spark, q, osql, "q_agg_psi", sf, "events").iloc[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)

    rows2, eid = [], 0
    for x in vals:
        eid += 1
        rows2.append((eid, "2024-01-08T10:00:00", eid, "view", x))
    for _ in vals:  # B mass all at the top value
        eid += 1
        rows2.append((eid, "2024-01-01T10:00:00", eid, "view", 20.0))
    sf2 = _write_events(tmp_path, rows2, "sfpsi11s")
    r2 = _cross_engine(
        spark, q, osql, "q_agg_psi", sf2, "events"
    ).iloc[0]
    assert r2["psi"] > 0.25


def test_pairwise_diffs_consistent_with_single_pair_ops(
    spark, tmp_path, q, osql
):
    """Three cohorts, the (purchase, view) row must reproduce the
    standalone q_agg_cohens_d values; signs flip with pair order."""
    rows = [
        (1, "2024-01-01T10:00:00", 1, "purchase", 10.0),
        (2, "2024-01-01T11:00:00", 2, "purchase", 14.0),
        (3, "2024-01-01T12:00:00", 3, "view", 4.0),
        (4, "2024-01-01T13:00:00", 4, "view", 8.0),
        (5, "2024-01-01T14:00:00", 5, "click", 6.0),
        (6, "2024-01-01T15:00:00", 6, "click", 6.0),
    ]
    sf = _write_events(tmp_path, rows, "sfpd11")
    spdf = _cross_engine(
        spark, q, osql, "q_agg_pairwise_diffs", sf, "events"
    ).set_index(["grp_a", "grp_b"])
    assert len(spdf) == 3
    r = spdf.loc[("purchase", "view")]
    d = 6 / math.sqrt(8)
    assert r["mean_diff"] == pytest.approx(6.0)
    assert r["cohens_d"] == pytest.approx(d, abs=1e-6)
    # zero-variance click cohort pairs get NULL t (var=0 both sides)
    rc = spdf.loc[("click", "purchase")]
    assert rc["mean_diff"] == pytest.approx(-6.0)
