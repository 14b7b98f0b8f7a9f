"""Round-13 co-activity graph hardening (VERDICT r12 items 2+3).

The co-activity edge build (`joins._coactivity_edges`) blocks users by
(event_type, minute) cohort and expands C(n,2) pairs per cohort — the
last uncapped quadratic in the engine.  Round 13 adds the auto-knee
cohort cap (COACT_*, the x_containment_dedup / GRAPH_PD_* rule) and a
session-scoped artifact cache.  These tests plant a hot-minute cohort
the fixtures never contain and pin both behaviors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_sse_spark.operators import joins

SF_DIR = "/root/testdata/sf0.001"


def _write_events(spark, rows, path):
    """Write a minimal events table with the fixture schema."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))


@pytest.fixture()
def planted(spark, tmp_path):
    """60 normal cohorts of 4 even users each + ONE flash-crowd cohort
    of 400 even users in a single (type, minute) bucket."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for c in range(60):  # normal cohorts: minute c, type "norm", 4 users
        for u in range(4):
            rows.append(
                (eid, base + dt.timedelta(minutes=c), 2 * (10 * c + u),
                 "norm", 1.0, None)
            )
            eid += 1
    hot = base + dt.timedelta(hours=2)
    for u in range(400):  # flash crowd: one cohort, 400 users
        rows.append((eid, hot, 2 * (100000 + u), "crowd", 1.0, None))
        eid += 1
    _write_events(spark, rows, str(tmp_path))
    return str(tmp_path)


def test_hot_minute_cohort_is_capped(spark, planted):
    """The flash-crowd cohort (400 users -> 79,800 pairs uncapped) must
    be dropped by the knee: the 1/16 profile sees only size-4 cohorts,
    so cap = max(64, 8*4) = 64 < 400.  Candidate pairs stay bounded at
    the normal cohorts' 60 * C(4,2) = 360."""
    joins._COACT_CACHE.clear()
    edges = joins._coactivity_edges(spark, planted)
    n = edges.count()
    assert n == 60 * 6, f"expected 360 capped edges, got {n}"
    # no crowd-cohort user pair survived
    crowd = edges.filter(F.col("u") >= 2 * 100000).count()
    assert crowd == 0


def test_cap_matches_duckdb_oracle_on_planted_skew(spark, planted):
    """The oracle CTE must apply the IDENTICAL knee on the planted skew
    (the fixtures never bind the cap, so this is the only case that
    exercises the mirrored rule end-to-end)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{planted}/events.parquet/*.parquet'"
    )
    sql = (
        f"WITH {joins._COACT_EDGES_CTE} "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "CAST(COALESCE(SUM(u + v), 0) AS BIGINT) AS endpoint_sum "
        "FROM edges"
    )
    want = con.sql(sql).fetchone()
    joins._COACT_CACHE.clear()
    edges = joins._coactivity_edges(spark, planted)
    got = tuple(
        edges.agg(
            F.count("*").cast("long"),
            F.coalesce(F.sum(F.col("u") + F.col("v")), F.lit(0)).cast(
                "long"
            ),
        ).first()
    )
    assert got == want, f"spark {got} != oracle {want}"


def test_cap_never_binds_on_fixture(spark):
    """On the uniform sf0.001 fixture the knee must be invisible —
    capped edges == the uncapped self-join's edges — so every prior
    driver record for the graph family stays valid."""
    joins._COACT_CACHE.clear()
    capped = joins._coactivity_edges(spark, SF_DIR)
    from kafka_connect_sse_spark.io import load_table

    act = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") % 2 == 0)
        .select(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("m"),
            "user_id",
        )
        .distinct()
    )
    a, b = act.alias("a"), act.alias("b")
    uncapped = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_edge_artifact_is_session_cached(spark):
    """VERDICT r12 item 3: within one session the three graph consumers
    must share ONE build — same DataFrame object back on re-call."""
    joins._COACT_CACHE.clear()
    e1 = joins._coactivity_edges(spark, SF_DIR)
    e2 = joins._coactivity_edges(spark, SF_DIR)
    assert e1 is e2
    # a different fixture dir is a different artifact
    assert (spark.sparkContext.applicationId, SF_DIR) in joins._COACT_CACHE
