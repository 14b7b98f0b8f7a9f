"""Behavioral tests for the round-9 operators on PLANTED corpora (the
oracle gate proves cross-engine parity; these prove the SEMANTICS on
constructed cases the fixture can't isolate)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_sse_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def _write_events_v(tmp_path, rows, name="sfev9"):
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


def _write_docs_src(tmp_path, rows, name="sfd9"):
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


def _write_emb(tmp_path, vecs, name="sfe9"):
    """vecs: (vec_id, [floats], label)."""
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


def test_ohlc_open_close_follow_event_id_tiebreak(spark, tmp_path, q):
    """Three 'view' events on one day: the open is the EARLIEST (ts,
    event_id) value and the close the LATEST — including an exact-ts tie
    broken by event_id (events 2 and 3 share a timestamp; event 3 has
    the larger id, so ITS value must be the close)."""
    rows = [
        (1, "2024-01-01T01:00:00", 1, "view", 5.0),
        (2, "2024-01-01T02:00:00", 1, "view", 9.0),
        (3, "2024-01-01T02:00:00", 1, "view", 2.0),
    ]
    r = q["q_ts_ohlc"](spark, _write_events_v(tmp_path, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
        5.0, 9.0, 2.0, 2.0, 3,
    )


def test_ewma_fold_matches_hand_computation(spark, tmp_path, q):
    """Daily counts 1, 2, 4 (one 'view' on day 1, two on day 2, four on
    day 3): EWMA at alpha=0.5 seeded at 1 is 0.5*2+0.5*1 = 1.5, then
    0.5*4+0.5*1.5 = 2.75."""
    rows = []
    eid = 0
    for day, n in (("01", 1), ("02", 2), ("03", 4)):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day}T00:00:{i:02d}", 1, "view", 1.0)
            )
    r = q["q_ts_ewma"](spark, _write_events_v(tmp_path, rows)).collect()
    assert len(r) == 1
    assert r[0]["n_days"] == 3
    assert r[0]["ewma_last"] == 2.75


def test_hhi_flags_single_user_domination(spark, tmp_path, q):
    """Day 1: one user produces all 4 events -> HHI = 1.0.  Day 2: four
    users produce one event each -> HHI = 4/16 = 0.25."""
    rows = [
        (1, "2024-01-01T00:00:01", 7, "view", 1.0),
        (2, "2024-01-01T00:00:02", 7, "view", 1.0),
        (3, "2024-01-01T00:00:03", 7, "view", 1.0),
        (4, "2024-01-01T00:00:04", 7, "view", 1.0),
        (5, "2024-01-02T00:00:01", 1, "view", 1.0),
        (6, "2024-01-02T00:00:02", 2, "view", 1.0),
        (7, "2024-01-02T00:00:03", 3, "view", 1.0),
        (8, "2024-01-02T00:00:04", 4, "view", 1.0),
    ]
    got = {
        r["day"]: (r["hhi"], r["n_users"])
        for r in q["q_agg_hhi"](spark, _write_events_v(tmp_path, rows)).collect()
    }
    assert got["2024-01-01"] == (1.0, 1)
    assert got["2024-01-02"] == (0.25, 4)


def test_attribution_linear_splits_credit_equally(spark, tmp_path, q):
    """User 1: view, view, click then purchase -> each of the 3 touches
    gets 1/3 (view 2/3, click 1/3).  User 2: click then purchase ->
    click gets 1.  User 3: touches but NO purchase -> zero credit.
    Expected credit: view 0.666667, click 1.333333."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view", 1.0),
        (2, "2024-01-01T00:00:02", 1, "view", 1.0),
        (3, "2024-01-01T00:00:03", 1, "click", 1.0),
        (4, "2024-01-01T00:00:04", 1, "purchase", 1.0),
        (5, "2024-01-01T00:00:01", 2, "click", 1.0),
        (6, "2024-01-01T00:00:02", 2, "purchase", 1.0),
        (7, "2024-01-01T00:00:01", 3, "view", 1.0),
        (8, "2024-01-01T00:00:02", 3, "click", 1.0),
    ]
    got = {
        r["attributed"]: (r["credit"], r["n_touches"])
        for r in q["q_attribution_linear"](
            spark, _write_events_v(tmp_path, rows)
        ).collect()
    }
    assert got["view"] == (pytest.approx(2 / 3, abs=1e-5), 2)
    assert got["click"] == (pytest.approx(4 / 3, abs=1e-5), 2)


def test_session_paths_conditional_probabilities(spark, tmp_path, q):
    """User 1 walks view->click->view->purchase; user 2 walks
    view->click.  Transitions: view->click x2, click->view x1,
    view->purchase x1.  P(click|view) = 2/3 on the view row."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view", 1.0),
        (2, "2024-01-01T00:00:02", 1, "click", 1.0),
        (3, "2024-01-01T00:00:03", 1, "view", 1.0),
        (4, "2024-01-01T00:00:04", 1, "purchase", 1.0),
        (5, "2024-01-01T00:00:01", 2, "view", 1.0),
        (6, "2024-01-01T00:00:02", 2, "click", 1.0),
    ]
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p_next"])
        for r in q["q_session_paths"](
            spark, _write_events_v(tmp_path, rows)
        ).collect()
    }
    assert got[("view", "click")] == (2, pytest.approx(2 / 3, abs=1e-5))
    assert got[("view", "purchase")] == (1, pytest.approx(1 / 3, abs=1e-5))
    assert got[("click", "view")] == (1, 1.0)
    assert ("purchase", "view") not in got  # purchase was user 1's last


def test_stickiness_dau_over_mau(spark, tmp_path, q):
    """Two observed days in one month: day 1 actives {1, 2}, day 2
    actives {1}.  sum_dau = 3, n_days = 2, mau = 2 ->
    stickiness = 3 / 2 / 2 = 0.75."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view", 1.0),
        (2, "2024-01-01T00:00:02", 2, "view", 1.0),
        (3, "2024-01-02T00:00:01", 1, "view", 1.0),
        (4, "2024-01-02T00:00:02", 1, "click", 1.0),  # same user+day: once
    ]
    r = q["q_user_stickiness"](spark, _write_events_v(tmp_path, rows)).collect()
    assert len(r) == 1
    assert (r[0]["sum_dau"], r[0]["n_days"], r[0]["mau"]) == (3, 2, 2)
    assert r[0]["stickiness"] == 0.75


def test_pagerank_hub_outranks_leaves(spark, tmp_path, q):
    """A star: hub user 2 co-occurs with leaves 4, 6, 8 in three
    DIFFERENT minute buckets (leaves never co-occur with each other).
    After 2 damped iterations the hub's PageRank must strictly exceed
    every leaf's, and the 4 nodes split rank mass deterministically."""
    rows = [
        (1, "2024-01-01T00:00:01", 2, "view", 1.0),
        (2, "2024-01-01T00:00:02", 4, "view", 1.0),
        (3, "2024-01-01T01:00:01", 2, "view", 1.0),
        (4, "2024-01-01T01:00:02", 6, "view", 1.0),
        (5, "2024-01-01T02:00:01", 2, "view", 1.0),
        (6, "2024-01-01T02:00:02", 8, "view", 1.0),
    ]
    rows_pr = q["q_pagerank_iter"](
        spark, _write_events_v(tmp_path, rows)
    ).collect()
    pr = {r["node"]: r["pagerank"] for r in rows_pr}
    assert rows_pr[0]["n_nodes"] == 4
    assert set(pr) == {2, 4, 6, 8}
    assert all(pr[2] > pr[leaf] for leaf in (4, 6, 8))
    assert pr[4] == pr[6] == pr[8]  # symmetric leaves


def test_welch_t_zero_for_identical_cohorts(spark, tmp_path, q):
    """Planted via the real fixture is unnecessary — on the sf0.001
    fixture the statistic must simply be finite and the cohort counts
    positive (the oracle gate pins the exact value)."""
    r = q["q_agg_welch_t"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["welch_t"] is not None


def test_heaps_law_spam_below_diverse(spark, tmp_path, q):
    """Source 'spam' repeats one 3-word line 30 times (vocab saturates,
    exponent near 0); source 'rich' has 30 lines of unique words
    (exponent near 1).  The exponent ordering is the semantic."""
    spam = [
        (i, "buy cheap now", "en", "spam") for i in range(30)
    ]
    rich = [
        (100 + i, f"alpha{i} beta{i} gamma{i}", "en", "rich")
        for i in range(30)
    ]
    got = {
        r["source"]: r["heaps_exponent"]
        for r in q["x_heaps_law"](
            spark, _write_docs_src(tmp_path, spam + rich)
        ).collect()
    }
    assert got["spam"] < 0.35 < got["rich"]
    assert got["rich"] > 0.9


def test_dup_ratio_counts_cross_source_dups(spark, tmp_path, q):
    """Sources A and B share one exact text; A also has an internal
    duplicate pair and one unique doc.  A: 3 of 4 docs are dup'd
    (0.75); B: its single shared doc is dup'd corpus-wide (1.0)."""
    rows = [
        (1, "shared text one", "en", "A"),
        (2, "inner dup two", "en", "A"),
        (3, "inner dup two", "en", "A"),
        (4, "unique three", "en", "A"),
        (5, "shared text one", "en", "B"),
    ]
    got = {
        r["source"]: (r["n_docs"], r["n_dup_docs"], r["dup_ratio"])
        for r in q["x_dup_ratio_by_source"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert got["A"] == (4, 3, 0.75)
    assert got["B"] == (1, 1, 1.0)


def test_langid_confusion_diagonal_on_planted_corpus(spark, tmp_path, q):
    """Docs labeled 'en' are stopword-dense (predicted en_like); docs
    labeled 'de' contain none of the English stopwords (predicted
    other) — the confusion matrix must be perfectly diagonal with
    row_share 1.0."""
    rows = [
        (1, "the cat of the house and the dog", "en", "A"),
        (2, "a road to the sea and a sky", "en", "A"),
        (3, "der hund lief schnell durch den wald", "de", "A"),
        (4, "die sonne scheint hell am himmel", "de", "A"),
    ]
    got = {
        (r["lang"], r["langid_pred"]): (r["n"], r["row_share"])
        for r in q["x_langid_confusion"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert got == {
        ("en", "en_like"): (2, 1.0),
        ("de", "other"): (2, 1.0),
    }


def test_label_separation_orthogonal_vs_identical(spark, tmp_path, q):
    """Labels 0 and 1 sit on orthogonal axes (centroid cosine 0); label
    2 duplicates label 0's direction (cosine 1 with label 0)."""
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [0.0, 1.0, 0.0, 0.0], 1),
        (5, [1.0, 0.0, 0.0, 0.0], 2),
    ]
    got = {
        (r["label_a"], r["label_b"]): r["centroid_cosine"]
        for r in q["x_label_separation"](
            spark, _write_emb(tmp_path, vecs)
        ).collect()
    }
    assert got[(0, 1)] == 0.0
    assert got[(0, 2)] == 1.0
    assert got[(1, 2)] == 0.0


def test_embed_whiten_kills_aligned_vector_norm(spark, tmp_path, q):
    """Every vector lies on the first axis, so the power iteration's
    direction IS that axis — whitening must drive every norm_after to
    ~0 while norm_before stays the original magnitude."""
    vecs = [
        (1, [2.0, 0.0, 0.0, 0.0], 0),
        (2, [3.0, 0.0, 0.0, 0.0], 0),
        (3, [5.0, 0.0, 0.0, 0.0], 1),
    ]
    rows = q["x_embed_whiten"](spark, _write_emb(tmp_path, vecs)).collect()
    assert {r["vec_id"]: r["norm_before"] for r in rows} == {
        1: 2.0, 2: 3.0, 3: 5.0,
    }
    assert all(abs(r["norm_after"]) < 1e-4 for r in rows)


def test_sketch_twin_guarantees_hold_on_fixture(spark, q):
    """The two scale twins' rank-guarantee booleans are the oracle
    contract — assert them directly at sf0.001 plus the exact columns
    they ride with."""
    r = q["x_embed_outliers_approx"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r["thr_rank_lo_ok"] and r["thr_rank_hi_ok"]
    assert r["n_vectors"] > 0
    rows = q["q_rfm_segments_approx"](spark, "/root/testdata/sf0.001").collect()
    assert {r["dim"] for r in rows} == {"r", "f", "m"}
    assert all(
        r["ok_q1"] and r["ok_q2"] and r["ok_q3"] for r in rows
    )


def test_streaming_ohlc_matches_batch_bars(spark, tmp_path, q):
    """s_ohlc_tumbling's stateful bars must equal q_ts_ohlc's batch
    answer re-bucketed hourly: one bucket, open 5 (earliest), close 2
    (latest by event_id tie), high 9, low 2."""
    rows = [
        (1, "2024-01-01T01:10:00", 1, "view", 5.0),
        (2, "2024-01-01T01:20:00", 1, "view", 9.0),
        (3, "2024-01-01T01:20:00", 1, "view", 2.0),
    ]
    sf = _write_events_v(tmp_path, rows)
    r = q["s_ohlc_tumbling"](spark, sf).collect()
    assert len(r) == 1
    row = r[0]
    assert row["win_start"] == "2024-01-01 01:00:00"
    assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
        5.0, 9.0, 2.0, 2.0, 3,
    )


def test_streaks_gaps_and_islands(spark, tmp_path, q):
    """User 1 is active Jan 1,2,3 then (gap) Jan 5 -> max streak 3.
    User 2 is active Jan 1 and Jan 3 -> max streak 1.  Same-day double
    activity (user 1, Jan 2) must not split or extend a streak."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view", 1.0),
        (2, "2024-01-02T00:00:01", 1, "view", 1.0),
        (3, "2024-01-02T12:00:00", 1, "click", 1.0),  # same day dup
        (4, "2024-01-03T00:00:01", 1, "view", 1.0),
        (5, "2024-01-05T00:00:01", 1, "view", 1.0),
        (6, "2024-01-01T00:00:01", 2, "view", 1.0),
        (7, "2024-01-03T00:00:01", 2, "view", 1.0),
    ]
    got = {
        r["max_streak"]: (r["n_users"], r["ids_sum"])
        for r in q["q_win_streaks"](
            spark, _write_events_v(tmp_path, rows)
        ).collect()
    }
    assert got == {3: (1, 1), 1: (1, 2)}


def test_topn_share_splits_head_and_tail(spark, tmp_path, q):
    """12 users with one event each on one day: the top-10 cut (ties on
    user_id) captures exactly 10 of 12 events -> share 10/12."""
    rows = [
        (i, f"2024-01-01T00:00:{i:02d}", i, "view", 1.0)
        for i in range(1, 13)
    ]
    r = q["q_agg_topn_share"](
        spark, _write_events_v(tmp_path, rows)
    ).collect()
    assert len(r) == 1
    assert (r[0]["n_events"], r[0]["topn_events"]) == (12, 10)
    assert r[0]["topn_share"] == pytest.approx(10 / 12, abs=1e-6)


def test_editdist_known_values(spark, q):
    """Pairwise distances over the fixture's five event types include
    the classic click/view distance and the self-similar band flag."""
    rows = q["q_fn_editdist"](spark, "/root/testdata/sf0.001").collect()
    got = {(r["type_a"], r["type_b"]): r["edit_dist"] for r in rows}
    assert len(got) == 10  # C(5,2) ordered pairs
    assert got[("click", "view")] == 4
    assert got[("purchase", "signup")] > 0


def test_token_budget_sums_exactly_and_is_proportional(spark, tmp_path, q):
    """Three sources with 10/30/60 tokens and B=100000: quotas must sum
    to EXACTLY B and order like the token counts."""
    rows = [
        (1, " ".join(["a"] * 10), "en", "small"),
        (2, " ".join(["b"] * 30), "en", "mid"),
        (3, " ".join(["c"] * 60), "en", "big"),
    ]
    got = {
        r["source"]: r["quota"]
        for r in q["x_token_budget"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert sum(got.values()) == 100_000
    assert got["big"] == 60_000 and got["mid"] == 30_000
    assert got["small"] == 10_000


def test_cross_lang_dup_flags_translation_template(spark, tmp_path, q):
    """Two byte-identical long documents labeled DIFFERENT languages
    (template localization gone wrong) must surface as a cross_lang
    pair; the same-language duplicate pair must not."""
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base, "en", "A"),
        (2, base, "de", "A"),          # cross-lang dup
        (3, base + " extraa", "fr", "A"),
        (4, "totally different words " + " ".join(f"z{i}" for i in range(40)), "en", "A"),
    ]
    got = {
        (r["lang_a"], r["lang_b"]): (r["cross_lang"], r["n_pairs"])
        for r in q["x_dup_cross_lang"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert got[("de", "en")][0] is True
    assert ("en", "en") not in got  # doc 4 shares nothing


def test_length_outliers_catch_concat_blowup(spark, tmp_path, q):
    """20 English docs of ~10 words and ONE 400-word concatenation
    blowup: the MAD fence must flag exactly the blowup (a mean/stddev
    fence would be dragged toward it)."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(10)), "en", "A")
        for i in range(20)
    ]
    rows.append((99, " ".join(f"b{j}" for j in range(400)), "en", "A"))
    r = q["x_length_outliers"](
        spark, _write_docs_src(tmp_path, rows)
    ).collect()
    assert len(r) == 1
    assert r[0]["n_docs"] == 21
    assert r[0]["n_outliers"] == 1


def test_token_budget_single_source_gets_everything(spark, tmp_path, q):
    """Degenerate apportionment: one source -> its quota IS the budget."""
    rows = [(1, "a b c", "en", "only")]
    got = q["x_token_budget"](
        spark, _write_docs_src(tmp_path, rows, name="sfd9a")
    ).collect()
    assert len(got) == 1
    assert got[0]["quota"] == 100_000


def test_token_budget_tie_remainders_rank_on_source(spark, tmp_path, q, monkeypatch):
    """Budget 5 over three equal 1-token sources: floor = 1 each (5/3),
    remainders all tie -> the 2 extras go to the lexicographically
    first sources ('a', 'b'), never 'c' — the deterministic-tie
    contract."""
    from kafka_connect_sse_spark.operators import pipeline as pl

    monkeypatch.setattr(pl, "TOKEN_BUDGET", 5)
    rows = [(1, "x", "en", "a"), (2, "y", "en", "b"), (3, "z", "en", "c")]
    # bypass the registered wrapper (which closes over the module
    # constant at call time — monkeypatch works because the op reads
    # pl.TOKEN_BUDGET via module global)
    got = {
        r["source"]: (r["quota"], r["got_remainder"])
        for r in pl.x_token_budget(
            spark, _write_docs_src(tmp_path, rows, name="sfd9b")
        ).collect()
    }
    assert sum(v[0] for v in got.values()) == 5
    assert got["a"] == (2, True)
    assert got["b"] == (2, True)
    assert got["c"] == (1, False)
