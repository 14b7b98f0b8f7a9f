"""Round-11 behavioral tests: the ADVICE r10 item 2 degenerate-group
guards (constant measure / single row) must yield NULL on BOTH engine
sides — the fixture has no degenerate group, so these planted corpora
are the only executable evidence the guard class works.  Each test runs
the Spark op AND its DuckDB oracle on the same planted parquet under
the driver's canonicalization (tools.check_correctness.canon)."""

from __future__ import annotations

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


def _write_lineitem(tmp_path, rows, name):
    """rows: (l_returnflag, l_quantity, l_extendedprice, l_discount,
    l_tax)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_quantity": pa.array(
                [float(r[1]) for r in rows], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "l_discount": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "l_tax": pa.array([float(r[4]) for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def _write_emb(tmp_path, vecs, name):
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    emb = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_skew_kurt_constant_group_nulls_match_oracle(
    spark, tmp_path, q, osql
):
    """Group A is constant (var_pop = 0): skewness/kurtosis must be
    NULL in BOTH engines (Spark would NULL on divide-by-zero anyway;
    DuckDB would return inf/nan without the CASE guard)."""
    sf = _write_lineitem(
        tmp_path,
        [("A", 7, 1, 0.1, 0.1)] * 3
        + [("B", v, 1, 0.1, 0.1) for v in (1, 2, 3, 10)],
        "sfskd11",
    )
    spdf = _cross_engine(
        spark, q, osql, "q_agg_skew_kurt", sf, "lineitem"
    )
    a = spdf[spdf.l_returnflag == "A"].iloc[0]
    assert a["var_pop"] == 0.0
    assert a["skewness"] is None or a["skewness"] != a["skewness"]
    assert (
        a["kurtosis_excess"] is None
        or a["kurtosis_excess"] != a["kurtosis_excess"]
    )
    b = spdf[spdf.l_returnflag == "B"].iloc[0]
    assert b["skewness"] == b["skewness"] and b["skewness"] is not None


def test_corr_matrix_constant_measure_nulls_match_oracle(
    spark, tmp_path, q, osql
):
    """l_tax is constant: every pair involving it has zero variance and
    must be NULL corr in BOTH engines; the quantity/extendedprice pair
    (perfectly correlated) stays 1.0."""
    sf = _write_lineitem(
        tmp_path,
        [("A", v, 10 * v, 0.01 * v, 0.05) for v in (1, 2, 3, 4)],
        "sfcorr11",
    )
    spdf = _cross_engine(
        spark, q, osql, "q_agg_corr_matrix", sf, "lineitem"
    )
    tax = spdf[(spdf.var_a == "l_tax") | (spdf.var_b == "l_tax")]
    assert len(tax) == 3
    assert tax["corr"].isna().all()
    qp = spdf[
        (spdf.var_a == "l_quantity") & (spdf.var_b == "l_extendedprice")
    ].iloc[0]
    assert qp["corr"] == 1.0


def test_embed_dim_stats_single_vector_nulls_match_oracle(
    spark, tmp_path, q, osql
):
    """One vector: stddev divides by n-1 = 0 — NULL stddev in BOTH
    engines (DuckDB would yield inf unguarded); the dead flag stays a
    non-null FALSE (one row can't attest a collapsed dim, and a
    nullable boolean renders 'None' vs 'nan' across engines)."""
    sf = _write_emb(tmp_path, [(1, [0.5, -0.25, 3.0], 0)], "sfemb11")
    spdf = _cross_engine(
        spark, q, osql, "x_embed_dim_stats", sf, "embeddings"
    )
    assert len(spdf) == 3
    assert spdf["stddev"].isna().all()
    assert not spdf["is_dead"].any()
    assert list(spdf.sort_values("dim")["mean"]) == [0.5, -0.25, 3.0]


def test_importance_resample_sampled_ranks_target_like_docs(
    spark, tmp_path, q, osql
):
    """DSIR twin semantics on a planted corpus: the 1/16 profile sample
    (doc_id % 16 == 0) sees an en doc made of 'alpha' tokens and a de
    doc made of 'beta' tokens, so alpha's bucket gets a positive log
    ratio and beta's a negative one — every alpha-heavy doc must
    outrank every beta-heavy doc, and the result must hash-match the
    oracle on the same planted parquet."""
    rows = []
    for i in range(32):
        if i < 16:  # sample (doc_id 0, 16) sees one doc of each kind
            rows.append((i, " ".join(["alpha"] * 20), "en", "s"))
        else:
            rows.append((i, " ".join(["beta"] * 20), "de", "s"))
    sf = _write_docs_r11(tmp_path, rows, "sfdsir11")
    spdf = _cross_engine(
        spark, q, osql, "x_importance_resample_sampled", sf, "documents"
    )
    ranked = list(spdf.sort_values("log_weight", ascending=False)["doc_id"])
    assert set(ranked[:16]) == set(range(16))
    assert (spdf["n_tokens"] == 20).all()


def _write_docs_r11(tmp_path, rows, name):
    """rows: (doc_id, text, lang, source)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _write_events_r11(tmp_path, rows, name):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    import datetime as dt

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


def test_theil_sen_ignores_single_spike_ols_would_not(
    spark, tmp_path, q, osql
):
    """Daily counts 1,2,3,4,100: of the 10 pairwise slopes, six are
    exactly 1.0 and the lower median (5th of 10) is 1.0 — the planted
    spike that would drag an OLS slope to ~+17 leaves Theil-Sen at
    exactly the clean trend.  Cross-engine hash must match on the same
    planted parquet."""
    import datetime as dt

    rows, eid = [], 0
    base = dt.date(2024, 3, 1)
    for i, c in enumerate([1, 2, 3, 4, 100]):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T09:00:00", 1, "view", 1.0))
    sf = _write_events_r11(tmp_path, rows, "sfts11")
    spdf = _cross_engine(spark, q, osql, "q_ts_theil_sen", sf, "events")
    r = spdf.iloc[0]
    assert (r["n_days"], r["n_pairs"]) == (5, 10)
    assert r["ts_slope"] == 1.0


def test_trimmed_mean_drops_and_winsorized_clips_hand_computed(
    spark, tmp_path, q, osql
):
    """Group A: one 1, eighteen 10s, one 100 (n=20, k=1): the trimmed
    mean drops both extremes (exactly 10.0) and the winsorized mean
    clips them to the surviving boundaries (also 10.0, lo=hi=10).
    Group B (n=4, k=0): trimming is a no-op — both means equal the
    plain mean, clips are the true min/max."""
    rows = (
        [("A", 1, 1, 0.0, 0.0)]
        + [("A", 10, 1, 0.0, 0.0)] * 18
        + [("A", 100, 1, 0.0, 0.0)]
        + [("B", v, 1, 0.0, 0.0) for v in (2, 10, 10, 18)]
    )
    sf = _write_lineitem(tmp_path, rows, "sftm11")
    spdf = _cross_engine(
        spark, q, osql, "q_agg_trimmed_mean", sf, "lineitem"
    )
    a = spdf[spdf.l_returnflag == "A"].iloc[0]
    assert (a["n_rows"], a["trim_k"]) == (20, 1)
    assert (a["trimmed_mean"], a["winsorized_mean"]) == (10.0, 10.0)
    assert (a["lo_clip"], a["hi_clip"]) == (10, 10)
    b = spdf[spdf.l_returnflag == "B"].iloc[0]
    assert (b["n_rows"], b["trim_k"]) == (4, 0)
    assert (b["trimmed_mean"], b["winsorized_mean"]) == (10.0, 10.0)
    assert (b["lo_clip"], b["hi_clip"]) == (2, 18)


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


def test_simhash_bitparallel_matches_filter_reference(spark, q):
    """The round-11 bit-parallel rewrite must be BIT-IDENTICAL to the
    32-filter-lambda reference form (_simhash_bit) that the oracle
    replays — same buckets, same counts, same keepers."""
    from pyspark.sql import functions as F

    from kafka_connect_sse_spark.operators.dedup import _simhash_bit

    sf = "/root/testdata/sf0.001"
    new = {
        (r.simhash32, r.n_docs, r.keep_id)
        for r in q["x_dedup_simhash"](spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.array_distinct(F.split(F.col("text"), " "))
    bits = [_simhash_bit(toks, i) for i in range(32)]
    fp = bits[0]
    for b in bits[1:]:
        fp = fp + b
    ref = {
        (r.simhash32, r.n_docs, r.keep_id)
        for r in d.select(
            "doc_id", fp.cast("long").alias("simhash32")
        )
        .groupBy("simhash32")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .collect()
    }
    assert new == ref and len(new) > 10


def test_simhash_counter_overflow_fails_loud(spark, tmp_path, q):
    """A document with more distinct tokens than the 16-bit counter
    lanes hold (65,535) must raise, never silently corrupt votes."""
    import pytest as _pytest

    big = " ".join(f"tok{i}" for i in range(70_000))
    sf = _write_documents(
        tmp_path, [(0, big, "en", "src0"), (1, "tiny doc", "en", "src0")],
        "sfsimov",
    )
    with _pytest.raises(Exception, match="65535 distinct tokens"):
        q["x_dedup_simhash"](spark, sf).collect()


import datetime as dt


def _write_events_v(tmp_path, rows, name="sfev11"):
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


def _daily_counts(tmp_path, counts, name="sfdc11"):
    """One 'view' series: counts[i] events on day 2024-01-01 + i."""
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i, c in enumerate(counts):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    return _write_events_v(tmp_path, rows, name)


def _write_part(tmp_path, rows, name="sfpart11"):
    """rows: (p_partkey, p_name)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([r[1] for r in rows], pa.string()),
            "p_brand": pa.array(["b"] * len(rows), pa.string()),
            "p_type": pa.array(["t"] * len(rows), pa.string()),
            "p_size": pa.array([1] * len(rows), pa.int32()),
            "p_retailprice": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "part.parquet"))
    return sf_dir


def test_mann_kendall_monotone_series_max_s_all_tied_nulls(
    spark, tmp_path, q, osql
):
    """A strictly rising 7-day series gives S = n(n-1)/2 = 21 with
    z > 0; an all-tied series makes var18 = 0 and z NULL on BOTH
    engines (degenerate-division rule)."""
    sf = _daily_counts(tmp_path, [1, 2, 3, 4, 5, 6, 7], "sfmk_up")
    spdf = _cross_engine(
        spark, q, osql, "q_ts_mann_kendall", sf, "events"
    )
    r = spdf.iloc[0]
    assert (r["n_days"], r["s_stat"]) == (7, 21)
    assert r["mk_z"] > 0
    sf2 = _daily_counts(tmp_path, [3] * 7, "sfmk_tied")
    spdf2 = _cross_engine(
        spark, q, osql, "q_ts_mann_kendall", sf2, "events"
    )
    r2 = spdf2.iloc[0]
    assert r2["var18"] == 0
    assert r2["mk_z"] is None or r2["mk_z"] != r2["mk_z"]


def test_mann_whitney_hand_computed_separated_groups(
    spark, tmp_path, q, osql
):
    """A = {1,2,3}, R = {4,5,6}: R1 = 6 (ranks 1+2+3), U1 = 0,
    z = -4.5/sqrt(5.25) — fully hand-checkable."""
    sf = _write_lineitem(
        tmp_path,
        [("A", v, 1, 0.0, 0.0) for v in (1, 2, 3)]
        + [("R", v, 1, 0.0, 0.0) for v in (4, 5, 6)],
        "sfmw11",
    )
    spdf = _cross_engine(
        spark, q, osql, "q_agg_mann_whitney", sf, "lineitem"
    )
    r = spdf.iloc[0]
    assert (r["n1"], r["n2"], r["twice_u1"], r["u1"]) == (3, 3, 0, 0.0)
    assert r["mw_z"] == pytest.approx(-4.5 / (5.25 ** 0.5))


def test_cramers_v_perfect_association_and_independence(
    spark, tmp_path, q, osql
):
    """Type X only on Mondays, type Y only on Tuesdays → V = 1;
    a balanced 2×2 table → χ² = 0, V = 0."""
    # 2024-01-01 is a Monday, 2024-01-02 a Tuesday
    rows = [(i, "2024-01-01T10:00:00", 1, "X", 1.0) for i in range(5)]
    rows += [
        (10 + i, "2024-01-02T10:00:00", 1, "Y", 1.0) for i in range(5)
    ]
    sf = _write_events_v(tmp_path, rows, "sfcv_assoc")
    r = _cross_engine(
        spark, q, osql, "q_agg_cramers_v", sf, "events"
    ).iloc[0]
    assert r["cramers_v"] == pytest.approx(1.0)
    rows2 = [
        (i, f"2024-01-0{1 + (i % 2)}T10:00:00", 1, "XY"[i // 2 % 2], 1.0)
        for i in range(8)
    ]
    sf2 = _write_events_v(tmp_path, rows2, "sfcv_indep")
    r2 = _cross_engine(
        spark, q, osql, "q_agg_cramers_v", sf2, "events"
    ).iloc[0]
    assert r2["chi2"] == pytest.approx(0.0)
    assert r2["cramers_v"] == pytest.approx(0.0)


def test_win_median_spike_robust_and_even_frame_interpolates(
    spark, tmp_path, q, osql
):
    """A 100x spike day leaves the trailing-7 median at the baseline
    (the moving AVG would jump ~15x); the two-row frame on day 2
    averages the two central elements."""
    sf = _daily_counts(
        tmp_path, [1, 3, 1, 100, 1, 1, 1, 1, 1, 1], "sfwm11"
    )
    spdf = _cross_engine(spark, q, osql, "q_win_median", sf, "events")
    spdf = spdf.sort_values("day").reset_index(drop=True)
    assert spdf.iloc[1]["med7"] == pytest.approx(2.0)  # (1+3)/2
    # spike day's own frame: sorted [1,1,3,100] -> (1+3)/2
    assert spdf.iloc[3]["med7"] == pytest.approx(2.0)
    # once 7 full days surround it, the median sits at baseline 1
    assert spdf.iloc[9]["med7"] == pytest.approx(1.0)


def test_sample_temperature_boosts_tail_language(
    spark, tmp_path, q, osql
):
    """90/10 token split at tau=2: the tail language is upsampled
    (w_fr = sqrt(.1)/(sqrt(.9)+sqrt(.1)) = .25), the head language
    downsampled, and the floor'd allocation never exceeds budget."""
    rows = [
        (0, " ".join(["en"] * 90), "en", "s0"),
        (1, " ".join(["fr"] * 10), "fr", "s0"),
    ]
    sf = _write_documents(tmp_path, rows, "sftemp11")
    spdf = _cross_engine(
        spark, q, osql, "x_sample_temperature", sf, "documents"
    )
    by = {r["lang"]: r for _, r in spdf.iterrows()}
    assert by["fr"]["upsample_x"] > 1.0 > by["en"]["upsample_x"]
    assert by["fr"]["p_sampled"] == pytest.approx(0.25, abs=1e-6)
    from kafka_connect_sse_spark.operators.pipeline import (
        TEMP_EPOCH_TOKENS,
    )

    assert spdf["epoch_tokens"].sum() <= TEMP_EPOCH_TOKENS


def test_fuzzy_edit_finds_typo_pair_and_pins_blocking_boundary(
    spark, tmp_path, q, osql
):
    """'blue bolt'/'blue boot' (dist 2, same block) is emitted;
    'hot gear'/'rot gear' (dist 1, DIFFERENT first token) is not —
    the documented blocking recall boundary, pinned on both engines."""
    sf = _write_part(
        tmp_path,
        [
            (1, "blue bolt"),
            (2, "blue boot"),
            (3, "hot gear"),
            (4, "rot gear"),
            (5, "green anvil"),
        ],
        "sffe11",
    )
    spdf = _cross_engine(
        spark, q, osql, "x_dedup_fuzzy_edit", sf, "part"
    )
    pairs = {(r["name_a"], r["name_b"]) for _, r in spdf.iterrows()}
    assert ("blue bolt", "blue boot") in pairs
    assert ("hot gear", "rot gear") not in pairs
    assert ("rot gear", "hot gear") not in pairs


def _write_lineitem_qd(tmp_path, rows, name):
    """rows: (l_returnflag, l_quantity, l_discount)."""
    sf_dir = str(tmp_path / name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_quantity": pa.array(
                [float(r[1]) for r in rows], pa.float64()
            ),
            "l_discount": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [1.0] * len(rows), pa.float64()
            ),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def test_spearman_and_kendall_perfect_monotone(spark, tmp_path, q, osql):
    """A strictly increasing (quantity, discount) relation scores
    rho = tau = 1 exactly; reversing the discounts scores -1; a
    constant marginal yields NULL on both engines."""
    up = [("A", i, i / 100.0) for i in range(1, 6)]
    down = [("A", i, (6 - i) / 100.0) for i in range(1, 6)]
    flat = [("A", i, 0.05) for i in range(1, 6)]
    sf = _write_lineitem_qd(tmp_path, up, "sfsp_up")
    r = _cross_engine(
        spark, q, osql, "q_agg_spearman", sf, "lineitem"
    ).iloc[0]
    assert r["rho_spearman"] == pytest.approx(1.0)
    rt = _cross_engine(
        spark, q, osql, "q_agg_kendall_tau", sf, "lineitem"
    ).iloc[0]
    assert (rt["conc"], rt["disc"]) == (10, 0)
    assert rt["tau_b"] == pytest.approx(1.0)
    sf2 = _write_lineitem_qd(tmp_path, down, "sfsp_down")
    r2 = _cross_engine(
        spark, q, osql, "q_agg_spearman", sf2, "lineitem"
    ).iloc[0]
    assert r2["rho_spearman"] == pytest.approx(-1.0)
    rt2 = _cross_engine(
        spark, q, osql, "q_agg_kendall_tau", sf2, "lineitem"
    ).iloc[0]
    assert rt2["tau_b"] == pytest.approx(-1.0)
    sf3 = _write_lineitem_qd(tmp_path, flat, "sfsp_flat")
    r3 = _cross_engine(
        spark, q, osql, "q_agg_spearman", sf3, "lineitem"
    ).iloc[0]
    assert r3["rho_spearman"] is None or r3["rho_spearman"] != r3[
        "rho_spearman"
    ]


def test_hodges_lehmann_hand_computed_and_outlier_robust(
    spark, tmp_path, q, osql
):
    """{1,2,3}: six Walsh averages [1, 1.5, 2, 2, 2.5, 3], lower
    median = 2.  Adding a 1000x outlier moves HL to 2.5 where the
    MEAN jumps to ~251."""
    sf = _write_lineitem(
        tmp_path,
        [("A", v, 1, 0.0, 0.0) for v in (1, 2, 3)],
        "sfhl_base",
    )
    r = _cross_engine(
        spark, q, osql, "q_agg_hodges_lehmann", sf, "lineitem"
    ).iloc[0]
    assert (r["n_walsh"], r["twice_hl"]) == (6, 4)
    assert r["hl_estimate"] == pytest.approx(2.0)
    sf2 = _write_lineitem(
        tmp_path,
        [("A", v, 1, 0.0, 0.0) for v in (1, 2, 3, 1000)],
        "sfhl_out",
    )
    r2 = _cross_engine(
        spark, q, osql, "q_agg_hodges_lehmann", sf2, "lineitem"
    ).iloc[0]
    assert r2["n_walsh"] == 10
    assert r2["hl_estimate"] == pytest.approx(2.5)


def test_changepoint_locates_planted_level_shift(
    spark, tmp_path, q, osql
):
    """[1,1,1,5,5,5]: the best split is after day 3 — means 1 vs 5,
    shift +4, located deterministically on both engines."""
    sf = _daily_counts(tmp_path, [1, 1, 1, 5, 5, 5], "sfcp11")
    r = _cross_engine(
        spark, q, osql, "q_ts_changepoint", sf, "events"
    ).iloc[0]
    assert (r["days_before"], r["days_after"]) == (3, 3)
    assert r["mean_before"] == pytest.approx(1.0)
    assert r["mean_after"] == pytest.approx(5.0)
    assert r["mean_shift"] == pytest.approx(4.0)
    assert str(r["cp_day"]) == "2024-01-03"


def test_window_distinct_users_dedups_within_hour_counts_across(
    spark, tmp_path, q, osql
):
    """User 1 fires 3 events in hour H (counts once) and once in hour
    H+1 (counts again); user 2 appears only in hour H."""
    rows = [
        (1, "2024-01-01T10:05:00", 1, "view", 1.0),
        (2, "2024-01-01T10:15:00", 1, "view", 1.0),
        (3, "2024-01-01T10:55:00", 1, "click", 1.0),
        (4, "2024-01-01T10:30:00", 2, "view", 1.0),
        (5, "2024-01-01T11:10:00", 1, "view", 1.0),
    ]
    sf = _write_events_v(tmp_path, rows, "sfwdu11")
    spdf = _cross_engine(
        spark, q, osql, "s_window_distinct_users", sf, "events"
    ).sort_values("win_start")
    assert list(spdf["n_users"]) == [2, 1]


def test_gopher_rules_per_rule_attribution(spark, tmp_path, q, osql):
    """Each planted document violates exactly one rule; the conjunction
    passes only for the clean one."""
    clean = "the quick brown fox jumps over the lazy dog again " * 6
    rows = [
        (0, clean.strip(), "en", "s0"),              # passes all
        (1, "short doc only five words", "en", "s0"),  # word count
        (2, " ".join(["a"] * 60) + " the of", "en", "s0"),  # mwl < 3
        (3, ("x1 y2 z3 " * 20).strip() + " the of", "en", "s0"),  # symbols
        (4, " ".join(f"w{i}" for i in range(60)), "en", "s0"),  # stopwords
    ]
    sf = _write_documents(tmp_path, rows, "sfgr11")
    spdf = _cross_engine(
        spark, q, osql, "x_gopher_rules", sf, "documents"
    ).set_index("doc_id")
    assert bool(spdf.loc[0, "gopher_pass"])
    assert not spdf.loc[1, "r_word_count"] and not spdf.loc[1, "gopher_pass"]
    assert not spdf.loc[2, "r_mean_word_len"]
    assert not spdf.loc[3, "r_symbol_ratio"]
    assert not spdf.loc[4, "r_stopwords"]


def test_ccnet_buckets_sizes_and_tail_holds_rare_bigrams(
    spark, tmp_path, q, osql
):
    """7 docs in one language -> NTILE(3) sizes 3/2/2; the two docs
    built from corpus-unique bigrams land in the tail (highest NLL)."""
    fluent = "the cat sat on the mat and the cat sat again"
    rows = [(i, fluent, "en", "s0") for i in range(5)]
    rows += [
        (5, "zq xv plw qnr vvk jjt", "en", "s0"),
        (6, "brr ghh wuu yss ppq mzz", "en", "s0"),
    ]
    sf = _write_documents(tmp_path, rows, "sfccb11")
    spdf = _cross_engine(
        spark, q, osql, "x_ccnet_buckets", sf, "documents"
    ).set_index("bucket")
    assert int(spdf.loc["head", "n_docs"]) == 3
    assert int(spdf.loc["middle", "n_docs"]) == 2
    assert int(spdf.loc["tail", "n_docs"]) == 2
    # the tail bucket's nll floor sits above the fluent docs' nll
    assert spdf.loc["tail", "min_nll"] > spdf.loc["head", "max_nll"]


def test_benford_shares_and_zero_digit_grid(spark, tmp_path, q, osql):
    """Planted prices: five 1xx, three 2xx, one 9xx — digits 3..8 must
    still appear as zero-count rows (the full-grid lesson)."""
    prices = [100.0, 150.0, 199.99, 101.5, 180.0,
              200.0, 250.5, 299.0, 900.0]
    rows = [("A", 1, p, 0.0, 0.0) for p in prices]
    sf = _write_lineitem(tmp_path, rows, "sfbf11")
    spdf = _cross_engine(
        spark, q, osql, "q_agg_benford", sf, "lineitem"
    ).set_index("digit")
    assert len(spdf) == 9
    assert int(spdf.loc[1, "n_obs"]) == 5
    assert int(spdf.loc[2, "n_obs"]) == 3
    assert int(spdf.loc[9, "n_obs"]) == 1
    for d in (3, 4, 5, 6, 7, 8):
        assert int(spdf.loc[d, "n_obs"]) == 0
    assert spdf.loc[1, "obs_share"] == pytest.approx(5 / 9, abs=1e-6)


def test_sma_crossover_golden_after_planted_regime_jump(
    spark, tmp_path, q, osql
):
    """28 high days, a week-long collapse, then a strong recovery:
    the 7-day SMA first crosses BELOW the 28-day (death), then back
    above (golden), in that order."""
    sf = _daily_counts(
        tmp_path, [10] * 28 + [1] * 7 + [30] * 10, "sfsmax11"
    )
    spdf = _cross_engine(
        spark, q, osql, "q_ts_sma_crossover", sf, "events"
    ).sort_values("cross_day")
    kinds = list(spdf["cross_kind"])
    assert kinds == ["death", "golden"], kinds
    d, g = spdf.iloc[0], spdf.iloc[1]
    assert d["sma7"] < d["sma28"] and g["sma7"] >= g["sma28"]


def test_iqr_outliers_hand_computed_fences(spark, tmp_path, q, osql):
    """Values 1..8 x4 plus one 1000: Q1=3, Q3=7, IQR=4, fences
    [-3, 13], exactly the 1000 falls outside."""
    rows = [("A", v, 1, 0.0, 0.0) for v in range(1, 9) for _ in range(4)]
    rows.append(("A", 1000, 1, 0.0, 0.0))
    sf = _write_lineitem(tmp_path, rows, "sfiqr11")
    r = _cross_engine(
        spark, q, osql, "q_agg_iqr_outliers", sf, "lineitem"
    ).iloc[0]
    assert (r["q1"], r["q3"], r["iqr"]) == (3, 7, 4)
    assert (r["lo_fence"], r["hi_fence"]) == (-3.0, 13.0)
    assert r["n_outliers"] == 1


def test_span_corruption_plan_budget_and_bounds(spark, tmp_path, q, osql):
    """30 tokens -> 1 span; 100 tokens -> 5 spans; 5 tokens -> no
    plan; every span sits inside [1, n-2]."""
    rows = [
        (0, " ".join(f"t{i}" for i in range(30)), "en", "s0"),
        (1, " ".join(f"t{i}" for i in range(100)), "en", "s0"),
        (2, "too short to corrupt here", "en", "s0"),
    ]
    sf = _write_documents(tmp_path, rows, "sfspan11")
    spdf = _cross_engine(
        spark, q, osql, "x_span_corruption_plan", sf, "documents"
    )
    by_doc = spdf.groupby("doc_id")
    assert len(by_doc.get_group(0)) == 1
    assert len(by_doc.get_group(1)) == 5
    assert 2 not in spdf["doc_id"].values
    for _, r in spdf.iterrows():
        assert 1 <= r["span_start"] <= r["n_tokens"] - 2
        assert r["span_end"] == r["span_start"] + 2
