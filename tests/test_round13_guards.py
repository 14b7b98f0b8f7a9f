"""Round-13 loud-failure guards (ADVICE r12 items 2+3).

Out-of-range inputs that previously degraded SILENTLY — a NULL reject
flag (friedman past the χ² table) or a NULLed variance (bollinger past
the DECIMAL(38,0) headroom) — must now raise on the Spark side exactly
where the DuckDB oracle raises, keeping cross-engine failure parity.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest


def _plant_events(spark, rows, path):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))


def test_friedman_df_out_of_range_raises(spark, tmp_path):
    """12 event types -> df = 11 > the literal χ² table's 10: the CASE's
    ELSE arm must raise, not NULL the reject flag."""
    from kafka_connect_sse_spark.operators.aggregates import q_agg_friedman

    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for day in range(3):
        for t in range(12):
            for _ in range(t + 1):
                rows.append(
                    (eid, base + dt.timedelta(days=day), 1,
                     f"type_{t:02d}", 1.0, None)
                )
                eid += 1
    _plant_events(spark, rows, str(tmp_path))
    with pytest.raises(Exception, match="chi2 table covers df 1..10"):
        q_agg_friedman(spark, str(tmp_path)).collect()


def test_friedman_in_range_df_still_passes(spark, tmp_path):
    """k = 4 (df = 3): the guard must be invisible inside the table."""
    from kafka_connect_sse_spark.operators.aggregates import q_agg_friedman

    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for day in range(4):
        for t in range(4):
            for _ in range(t + 2):
                rows.append(
                    (eid, base + dt.timedelta(days=day), 1,
                     f"type_{t}", 1.0, None)
                )
                eid += 1
    _plant_events(spark, rows, str(tmp_path))
    out = q_agg_friedman(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(r["chi2_crit_95"] == 7.815 for r in out)
    assert all(r["reject"] is not None for r in out)


def test_bollinger_overflow_knee_raises(spark, tmp_path):
    """A daily total past BOLL_MU_HEADROOM (1e17 micro-units) must raise
    loudly instead of Spark's non-ANSI decimal multiply NULLing the
    variance while DuckDB throws."""
    from kafka_connect_sse_spark.operators.aggregates import q_ts_bollinger

    base = dt.datetime(2024, 5, 1)
    rows = [
        (0, base, 1, "purchase", 2.0e11, None),  # mu = 2e17 micro-units
        (1, base + dt.timedelta(days=1), 1, "purchase", 1.0, None),
    ]
    _plant_events(spark, rows, str(tmp_path))
    with pytest.raises(Exception, match="variance headroom"):
        q_ts_bollinger(spark, str(tmp_path)).collect()


def test_bollinger_under_knee_unchanged(spark, tmp_path):
    """Totals inside the headroom compute bands exactly as before."""
    from kafka_connect_sse_spark.operators.aggregates import q_ts_bollinger

    base = dt.datetime(2024, 5, 1)
    rows = [
        (i, base + dt.timedelta(days=i), 1, "purchase", 10.0 + i, None)
        for i in range(9)
    ]
    _plant_events(spark, rows, str(tmp_path))
    out = {r["day"]: r for r in q_ts_bollinger(spark, str(tmp_path)).collect()}
    assert len(out) == 9
    # 2024-05-09: full 7-day window over values 12..18 -> sma = 15
    r = out["2024-05-09"]
    assert r["n_win"] == 7 and r["sma"] == 15.0
    assert r["breakout"] == "in"


def test_minhash_producer_recomputes_consumers_share(spark):
    """x_dedup_near_minhash must COMPUTE on every invocation (a bench/
    oracle run may never be served from the session memo — that would be
    result caching, not optimization); only downstream consumers
    (x_dup_graph_degree, x_dup_cross_lang) reuse the session artifact via
    minhash_pairs_artifact."""
    from kafka_connect_sse_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    df1 = dedup.x_dedup_near_minhash(spark, sf)
    df2 = dedup.x_dedup_near_minhash(spark, sf)
    # a fresh checkpointed relation per invocation, never the memo object
    assert df2 is not df1
    # the consumer helper DOES hand back the session artifact (the
    # producer's most recent checkpoint)
    df3 = dedup.minhash_pairs_artifact(spark, sf)
    assert df3 is df2
    # and the results agree, of course
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
