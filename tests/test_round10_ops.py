"""Behavioral tests for the round-10 operators on PLANTED corpora (the
oracle gate proves cross-engine parity; these prove the SEMANTICS on
constructed cases the fixture can't isolate)."""

from __future__ import annotations

import datetime as dt
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_sse_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def _write_events_v(tmp_path, rows, name="sfev10"):
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


def _daily_counts(tmp_path, counts, name="sfdc10"):
    """One 'view' series: counts[i] events on day 2024-01-01 + i."""
    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for i, c in enumerate(counts):
        day = (base + dt.timedelta(days=i)).isoformat()
        for _ in range(c):
            eid += 1
            rows.append((eid, f"{day}T12:00:00", 1, "view", 1.0))
    return _write_events_v(tmp_path, rows, name)


def _write_docs(tmp_path, rows, name="sfd10"):
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


def _write_lineitem(tmp_path, rows, name="sfl10"):
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


def _write_emb(tmp_path, vecs, name="sfe10"):
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


def test_holt_matches_hand_computation(spark, tmp_path, q):
    """Daily counts 1, 2, 4: seed l=1, b=2-1=1; folding x=4 gives
    l' = 0.5*4 + 0.5*(1+1) = 3, b' = 0.25*(3-1) + 0.75*1 = 1.25,
    forecast 4.25."""
    r = q["q_ts_holt"](spark, _daily_counts(tmp_path, [1, 2, 4])).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_days"], row["level"], row["trend"]) == (3, 3.0, 1.25)
    assert row["forecast_1"] == 4.25


def test_holt_two_point_series_is_pure_seed(spark, tmp_path, q):
    """Exactly two days: the state is the seed itself (no fold steps) —
    level x1, trend x2-x1."""
    r = q["q_ts_holt"](spark, _daily_counts(tmp_path, [3, 5])).collect()
    assert (r[0]["level"], r[0]["trend"], r[0]["forecast_1"]) == (
        3.0,
        2.0,
        5.0,
    )


def test_cusum_sustained_drift_alerts_single_spike_does_not(
    spark, tmp_path, q
):
    """Ten days at 1 then ten at 5: S = n·Σ(x−μ) climbs 40/day through
    the drifted half and crosses the 4σ·n fence; the expected alert
    count and final value are recomputed here with the op's own
    formulas."""
    counts = [1] * 10 + [5] * 10
    n, s1 = len(counts), sum(counts)
    s2 = sum(c * c for c in counts)
    sd = round(math.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
    thr = 4.0 * sd * n
    s_int, alerts = 0, 0
    for c in counts:
        s_int = max(0, s_int + n * c - s1)
        alerts += 1 if s_int > thr else 0
    assert alerts > 0  # the planted drift must actually alert
    r = q["q_ts_cusum"](spark, _daily_counts(tmp_path, counts)).collect()
    row = r[0]
    assert row["n_alerts"] == alerts
    assert row["cusum_final"] == s_int / n
    assert row["sd_daily"] == sd


def test_seasonal_dow_doubled_mondays(spark, tmp_path, q):
    """Two full weeks starting Monday 2024-01-01, 2 events on Mondays
    and 1 elsewhere: Monday's index is 2/(16/14) = 1.75, other days
    0.875."""
    counts = [2, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1, 1, 1, 1]
    rows = q["q_ts_seasonal_dow"](
        spark, _daily_counts(tmp_path, counts)
    ).collect()
    by_dow = {r["dow"]: r for r in rows}
    assert len(by_dow) == 7
    assert by_dow[1]["seasonal_index"] == 1.75  # ISO Monday
    assert by_dow[3]["seasonal_index"] == 0.875


def test_skew_kurt_symmetric_and_numpy_parity(spark, tmp_path, q):
    """A symmetric quantity distribution has skewness exactly 0; the
    planted asymmetric group matches the population formulas computed
    independently here."""
    sym = [("A", v, 10.0, 0.0, 0.0) for v in (1, 2, 2, 3)]
    asym_vals = [1, 1, 1, 10]
    asym = [("B", v, 10.0, 0.0, 0.0) for v in asym_vals]
    rows = q["q_agg_skew_kurt"](
        spark, _write_lineitem(tmp_path, sym + asym)
    ).collect()
    by = {r["l_returnflag"]: r for r in rows}
    assert by["A"]["skewness"] == 0.0
    n = len(asym_vals)
    m1 = sum(asym_vals) / n
    m2 = sum(v * v for v in asym_vals) / n - m1 * m1
    m3 = (
        sum(v**3 for v in asym_vals) / n
        - 3 * m1 * (sum(v * v for v in asym_vals) / n)
        + 2 * m1**3
    )
    m4 = (
        sum(v**4 for v in asym_vals) / n
        - 4 * m1 * (sum(v**3 for v in asym_vals) / n)
        + 6 * m1 * m1 * (sum(v * v for v in asym_vals) / n)
        - 3 * m1**4
    )
    assert by["B"]["skewness"] == round(m3 / m2**1.5, 6)
    assert by["B"]["kurtosis_excess"] == round(m4 / (m2 * m2) - 3, 6)


def test_corr_matrix_planted_perfect_correlations(spark, tmp_path, q):
    """quantity == 2·discount exactly -> corr +1; tax = −extendedprice
    + 100 -> corr −1; six pairs per group."""
    rows = [
        ("A", v, p, v / 2.0, 100.0 - p)
        for v, p in ((2.0, 10.0), (4.0, 20.0), (6.0, 50.0), (8.0, 90.0))
    ]
    out = q["q_agg_corr_matrix"](
        spark, _write_lineitem(tmp_path, rows)
    ).collect()
    assert len(out) == 6
    by = {(r["var_a"], r["var_b"]): r["corr"] for r in out}
    assert by[("l_quantity", "l_discount")] == 1.0
    assert by[("l_extendedprice", "l_tax")] == -1.0


def test_markov_transitions_row_normalize(spark, tmp_path, q):
    """One user's path view→click→view→click→purchase: P(click|view)=1,
    P(view|click)=0.5, P(purchase|click)=0.5."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view", 0.0),
        (2, "2024-01-01T00:00:02", 1, "click", 0.0),
        (3, "2024-01-01T00:00:03", 1, "view", 0.0),
        (4, "2024-01-01T00:00:04", 1, "click", 0.0),
        (5, "2024-01-01T00:00:05", 1, "purchase", 0.0),
    ]
    out = q["q_markov_transitions"](
        spark, _write_events_v(tmp_path, rows)
    ).collect()
    by = {(r["from_type"], r["to_type"]): r for r in out}
    assert by[("view", "click")]["n"] == 2
    assert by[("view", "click")]["p"] == 1.0
    assert by[("click", "view")]["p"] == 0.5
    assert by[("click", "purchase")]["p"] == 0.5


def test_funnel_ttc_counts_only_post_signup_purchases(spark, tmp_path, q):
    """User 1 converts in 60s; user 2 purchased BEFORE signing up (no
    later purchase) and must not count; p50 of the one converter is
    60."""
    rows = [
        (1, "2024-01-01T00:00:00", 1, "signup", 0.0),
        (2, "2024-01-01T00:01:00", 1, "purchase", 0.0),
        (3, "2024-01-02T00:00:00", 2, "purchase", 0.0),
        (4, "2024-01-02T01:00:00", 2, "signup", 0.0),
    ]
    out = q["q_funnel_ttc"](
        spark, _write_events_v(tmp_path, rows)
    ).collect()[0]
    assert out["n_converted"] == 1
    assert out["min_sec"] == 60
    assert out["p50_sec"] == 60.0
    assert out["max_sec"] == 60


def test_tok_len_hist_buckets_and_pooled_top(spark, tmp_path, q):
    """5 tokens -> bucket 0; 95 tokens -> bucket 9; 150 tokens pools
    into bucket 9 too."""
    docs = [
        (1, " ".join(["w"] * 5), "en", "s"),
        (2, " ".join(["w"] * 95), "en", "s"),
        (3, " ".join(["w"] * 150), "en", "s"),
    ]
    out = q["x_tok_len_hist"](spark, _write_docs(tmp_path, docs)).collect()
    by = {r["bucket"]: r for r in out}
    assert by[0]["n_docs"] == 1
    assert by[9]["n_docs"] == 2  # 95-token + pooled 150-token
    assert by[9]["bucket_lo"] == 90
    assert round(by[0]["share"], 6) == round(1 / 3, 6)


def test_doc_len_gini_zero_for_equal_lengths(spark, tmp_path, q):
    """Equal lengths -> G = 0; the skewed source matches the rank
    formula computed here."""
    eq = [(i, "a b c", "en", "flat") for i in range(4)]
    skew_lens = [1, 1, 1, 97]
    skew = [
        (10 + i, " ".join(["w"] * n), "en", "skew")
        for i, n in enumerate(skew_lens)
    ]
    out = q["x_doc_len_gini"](
        spark, _write_docs(tmp_path, eq + skew)
    ).collect()
    by = {r["source"]: r for r in out}
    assert by["flat"]["gini"] == 0.0
    xs = sorted(skew_lens)
    n, sx = len(xs), sum(xs)
    g = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sx) / (
        n * sx
    )
    assert by["skew"]["gini"] == round(g, 6)
    assert by["skew"]["total_tokens"] == sx


def test_char_ngram_entropy_degenerate_is_zero(spark, tmp_path, q):
    """A language whose every trigram is identical has entropy exactly
    0; a diverse language is strictly positive."""
    docs = [
        (1, "aaaaaa", "aa", "s"),
        (2, "abcdefgh", "en", "s"),
    ]
    out = q["x_char_ngram_entropy"](
        spark, _write_docs(tmp_path, docs)
    ).collect()
    by = {r["lang"]: r for r in out}
    assert by["aa"]["n_distinct"] == 1
    assert by["aa"]["entropy_nats"] == 0.0
    assert by["en"]["n_distinct"] == 6
    assert by["en"]["entropy_nats"] > 1.7  # ln(6) ≈ 1.7918, uniform


def test_embed_dim_stats_flags_dead_dimension(spark, tmp_path, q):
    """dim 0 constant across vectors -> stddev 0, dead; dim 1 varies ->
    alive with the expected mean."""
    vecs = [
        (1, [0.5, 0.0], 0),
        (2, [0.5, 1.0], 0),
        (3, [0.5, 2.0], 0),
    ]
    out = q["x_embed_dim_stats"](
        spark, _write_emb(tmp_path, vecs)
    ).collect()
    by = {r["dim"]: r for r in out}
    assert by[0]["is_dead"] and by[0]["stddev"] == 0.0
    assert not by[1]["is_dead"]
    assert by[1]["mean"] == 1.0
    assert by[1]["n_vecs"] == 3


def test_mad_approx_guarantees_hold_on_fixture(spark, q):
    """The sketch twin's rank-guarantee booleans are the oracle
    contract — assert them directly at sf0.001 with the exact group
    counts."""
    rows = q["q_agg_mad_approx"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    assert all(r["ok_med"] and r["ok_mad"] for r in rows)
    assert all(r["n_rows"] > 0 for r in rows)


def test_decontaminate_short_docs_emit_no_grams(spark, tmp_path, q):
    """The round-10 gram-build rewrite guards sequence() BEFORE
    evaluation: Spark's sequence(1, 0) steps DOWN to [1, 0] instead of
    yielding an empty list, which would emit a truncated gram for a
    sub-5-token doc.  A 3-token training doc must produce zero hits
    even when its full text appears inside a benchmark doc."""
    docs = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s"),  # bench
        (25, "alpha beta gamma", "en", "s"),  # too short for any 5-gram
        (26, "alpha beta gamma delta epsilon zeta eta", "en", "s"),
    ]
    out = q["x_decontaminate"](spark, _write_docs(tmp_path, docs)).collect()
    by = {r["doc_id"]: r["n_hits"] for r in out}
    assert 25 not in by  # no 5-grams at all -> no row
    assert by[26] == 2  # shares 'alpha..epsilon' and 'beta..zeta'


def test_holt_fold_matches_python_reference_on_random_series(
    spark, tmp_path, q
):
    """Property check: over seeded random daily-count series the Spark
    fold reproduces a pure-Python implementation of the SAME
    integer-micro-unit recurrence EXACTLY (the recurrence is exact
    integer arithmetic, so equality is ==, not approx).  The reference
    must round HALF AWAY FROM ZERO like Spark's BigDecimal HALF_UP and
    DuckDB's std::round — Python's built-in round() is half-to-EVEN
    and diverges one micro-unit on exact .5 ties (this test originally
    caught exactly that, in its own reference)."""
    import random

    def half_away(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    rng = random.Random(1007)
    for case in range(4):
        counts = [rng.randint(1, 500) for _ in range(rng.randint(2, 40))]
        scale = 1_000_000
        lv, tr = counts[0] * scale, (counts[1] - counts[0]) * scale
        for x in counts[2:]:
            new_lv = half_away(0.5 * x * scale + 0.5 * (lv + tr))
            tr = half_away(0.25 * (new_lv - lv) + 0.75 * tr)
            lv = new_lv
        r = q["q_ts_holt"](
            spark, _daily_counts(tmp_path, counts, name=f"holtp{case}")
        ).collect()[0]
        assert r["level"] == lv / scale, (case, counts)
        assert r["trend"] == tr / scale, (case, counts)


def test_cusum_fold_matches_python_reference_on_random_series(
    spark, tmp_path, q
):
    """Same property for CUSUM: the n-scaled integer recurrence and the
    alert count match a pure-Python reference exactly."""
    import random

    rng = random.Random(2024)
    for case in range(4):
        counts = [rng.randint(1, 300) for _ in range(rng.randint(2, 40))]
        n, s1 = len(counts), sum(counts)
        s2 = sum(c * c for c in counts)
        sd = round(math.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
        s_int, alerts = 0, 0
        for c in counts:
            s_int = max(0, s_int + n * c - s1)
            alerts += 1 if s_int > 4.0 * sd * n else 0
        r = q["q_ts_cusum"](
            spark, _daily_counts(tmp_path, counts, name=f"cusump{case}")
        ).collect()[0]
        assert r["cusum_final"] == s_int / n, (case, counts)
        assert r["n_alerts"] == alerts, (case, counts)
