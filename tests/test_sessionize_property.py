"""Property-based check of q_sessionize's invariants: within a session no
gap exceeds the threshold; consecutive sessions of a user are separated by
MORE than the threshold; session ids are dense from 1."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from kafka_connect_sse_spark.operators.windows import SESSION_GAP_US


def _sessions(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")
    w = F.window  # noqa: F841 (parity with operator module imports)
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = df.withColumn(
        "new_sess",
        F.when(
            (F.col("us") - F.lag("us").over(win) > SESSION_GAP_US)
            | F.lag("us").over(win).isNull(),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).collect()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # user
            st.integers(min_value=0, max_value=10**10),  # epoch us
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_invariants(spark, events):
    rows = [(u, i, us) for i, (u, us) in enumerate(events)]
    out = _sessions(spark, rows)
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.us, r.event_id))
        # dense ids from 1
        ids = [r.session_id for r in rs]
        assert ids[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))
        for a, b in zip(rs, rs[1:]):
            gap = b.us - a.us
            if b.session_id == a.session_id:
                assert gap <= SESSION_GAP_US
            else:
                assert gap > SESSION_GAP_US
