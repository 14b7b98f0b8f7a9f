"""Window-function operators + sorts/limits (SURVEY.md §2.4).

Each window spec shuffles once on its partition key and sorts within
partitions; at 100 TB the partition key choice (per-flag, per-customer) is
what bounds state per task.  Every ORDER BY carries a unique tiebreak so
rank/lag outputs are deterministic across engines and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_win_ranking",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk,
           NTILE(4) OVER w AS quartile
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
    """,
)
def q_win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile over one window spec."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics incl. explicit default value."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@register(
    "q_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running) sum; DECIMAL keeps the prefix sums exact,
    DOUBLE at the output boundary for cross-engine pandas parity."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
    FROM orders
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row moving average (frame order fixes the FP summation
    order, so both engines produce bit-identical means)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("ma3"),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER (
             PARTITION BY l_returnflag ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: rows whose l_quantity is within 5 below."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count("*").over(w).alias("n_within_5"),
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
           LAST_VALUE(o_orderkey) OVER w AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an explicit full-partition frame (the default
    frame would make LAST_VALUE degenerate)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w).alias("priciest_order"),
    )


@register(
    "q_win_pct",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM lineitem
    WHERE l_orderkey % 25 = 0
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
)
def q_win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (exact rationals — identical across engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 25 == 0)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_cheapest,
           LAST_VALUE(o_orderkey IGNORE NULLS) OVER w AS last_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + last_value(ignore nulls) over a full-partition frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_key"),
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window + filter (Spark pushes the rn<=k
    limit into the window sort as a per-partition top-k at scale)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderpriority, '3-MEDIUM') AS prio_or_null,
           o_totalprice
    FROM orders
    ORDER BY o_orderstatus DESC,
             NULLIF(o_orderpriority, '3-MEDIUM') ASC NULLS LAST,
             o_totalprice DESC
    """,
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with desc + nulls-last (a range-partitioned
    exchange; the value-hash is order-insensitive but the keys are in the
    output so values are still fully checked)."""
    o = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            prio.alias("prio_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("o_orderstatus").desc(),
            F.col("prio_or_null").asc_nulls_last(),
            F.col("o_totalprice").desc(),
        )
    )


@register(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark executes TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort — the right plan at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "q_compact_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS last_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction as a query: keep only the LATEST record per key —
    the semantics of a compacted Kafka topic, which is where the
    reference's producer durably lands its stream (README.md topology).
    One window shuffle on the key; at 100 TB this is the standard
    CDC/upsert materialization (ROW_NUMBER ... rn=1), and Spark pushes
    the rn<=1 filter into the sort as a per-key top-1."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


SESSION_GAP_US = 1_800_000_000  # 30-minute inactivity gap, microseconds


@register(
    "q_sessionize",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - LAG(us) OVER w > {SESSION_GAP_US}
                  OR LAG(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    numbered AS (
      SELECT user_id, event_id, us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream at >30-minute
    inactivity gaps (lag + running sum of boundary flags — the standard
    two-window formulation), then aggregate per session.  Both windows
    share ONE partitioning (user_id) and sort order, so Spark plans a
    single window shuffle + sort reused by lag and the running sum; the
    per-session rollup is the only further exchange.  The streaming twin
    is s_window_session (session_window with watermark eviction).
    Microsecond epoch arithmetic is identical in both engines; ties on ts
    are broken by event_id so session numbering is deterministic."""
    e = load_table(spark, sf_dir, "events")
    o = e.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = o.withColumn(
        "new_sess",
        F.when(
            (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max("us") - F.min("us")) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_sec"),
    )


@register(
    "q_win_time_range",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS val_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the trailing-1-hour event
    count and value sum at every event — the rolling-window shape rate
    limiting, fraud scoring, and feature backfills use.  Unlike the
    value-RANGE twin (q_win_range_frame), the frame bound is a calendar
    INTERVAL over the event-time column itself (peers with equal ts share
    a frame, identically in both engines).  One window shuffle on
    user_id — high-cardinality, so scale-safe; Spark evaluates the frame
    with a sliding two-pointer over each partition's sort, not a rescan
    per row."""
    from ..io import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id,
               date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS val_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "q_cdc_scd2",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           event_type AS state,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: each event
    opens a validity interval [valid_from, valid_to) closed by the key's
    next change (LEAD), with the open-ended latest row flagged current —
    the standard lakehouse history-table build.  ONE window shuffle on
    the (high-cardinality) key; at 100 TB this is exactly how a dimension
    history materializes from CDC, and the interval form is what
    point-in-time joins (q_join_asof) probe against."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("event_type").alias("state"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@register(
    "q_win_count_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(DISTINCT o_orderpriority)
               OVER (PARTITION BY o_custkey) AS n_priorities
    FROM orders
    """,
)
def q_win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a window — Spark rejects distinct aggregates
    in window frames, so this uses the portable dense_rank emulation:
    within each partition, max(dense_rank ordered by the value) equals
    the distinct count.  Costs one extra pass over the same (already
    shuffled+sorted) partition — both windows share the o_custkey
    Exchange, so the scale posture is identical to any single window op.
    NULL handling: orders has no null priorities, so rank-counting and
    COUNT DISTINCT agree (with nulls the emulation needs a null-excluded
    rank; documented rather than fixture-exercised)."""
    o = load_table(spark, sf_dir, "orders")
    rk_w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    full_w = Window.partitionBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.max(F.dense_rank().over(rk_w)).over(full_w).alias("n_priorities"),
    )


@register(
    "q_funnel_stages",
    oracle="""
    WITH s1 AS (SELECT user_id,
                  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
                FROM events GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_users,
           (SELECT COUNT(t1) FROM s1) AS reached_view,
           (SELECT COUNT(*) FROM s2) AS reached_click,
           (SELECT COUNT(*) FROM s3) AS reached_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
                 / (SELECT COUNT(t1) FROM s1), 6) AS conv_view_click,
           ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s2), 6) AS conv_click_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s1), 6) AS conv_overall
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, each stage
    strictly AFTER the previous one for that user) — the product-
    analytics staple the reference's SSE -> ksqlDB topology exists to
    serve, as three CHAINED conditional-min windows: t1 = first view,
    t2 = first click after t1, t3 = first purchase after t2.  An
    unordered 'did all three' count would overstate conversion (a
    purchase before the view must NOT count) — the strict ts ordering is
    the semantic.

    100 TB posture: all three windows AND the per-user rollup share ONE
    user_id exchange (q_sessionize discipline — chained windows on the
    same partitioning add zero shuffles); the funnel summary is a
    single-row final aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    d = (
        e.withColumn(
            "t1",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = d.groupBy("user_id").agg(
        F.any_value("t1").alias("t1"),
        F.any_value("t2").alias("t2"),
        F.any_value("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("reached_view"),
        F.count("t2").alias("reached_click"),
        F.count("t3").alias("reached_purchase"),
        F.round(F.count("t2").cast("double") / F.count("t1"), 6).alias(
            "conv_view_click"
        ),
        F.round(F.count("t3").cast("double") / F.count("t2"), 6).alias(
            "conv_click_purchase"
        ),
        F.round(F.count("t3").cast("double") / F.count("*"), 6).alias(
            "conv_overall"
        ),
    )


@register(
    "q_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed
      FROM events)
    SELECT COALESCE(attributed, 'none') AS attributed,
           COUNT(*) AS n_purchases,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM seq WHERE event_type = 'purchase'
    GROUP BY attributed
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent PRECEDING touch event (view/click; 'none' when the purchase
    had no prior touch) — the marketing-analytics companion to
    q_funnel_stages, and the in-stream as-of-lookup pattern (an ordered
    ignore-nulls last_value over a 1-preceding frame, never a self
    join).  Same-timestamp ties order on event_id so both engines walk
    one deterministic sequence.

    100 TB posture: ONE user_id window exchange does the attribution;
    the rollup shuffles |event types| groups and the share rides a
    window over that bounded relation."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_type",
        F.last(
            F.when(
                F.col("event_type").isin("view", "click"),
                F.col("event_type"),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("attributed"),
    )
    p = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce("attributed", F.lit("none")).alias("attributed")
    )
    g = p.groupBy("attributed").agg(F.count("*").alias("n_purchases"))
    wall = Window.partitionBy()
    return g.select(
        "attributed",
        "n_purchases",
        F.round(
            F.col("n_purchases").cast("double")
            / F.sum("n_purchases").over(wall),
            6,
        ).alias("share"),
    )


@register(
    "q_session_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6)
               AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: for every in-session
    step, the (previous event type -> next event type) pair, counted,
    with the conditional probability P(next | prev) — the Markov-chain
    path analysis behind 'where do users go after X' (with
    q_funnel_stages' fixed funnel this covers both directed and
    exploratory flow questions).

    Cross-engine exactness: counts integer; same-timestamp ties order
    on event_id (the q_attribution_last_touch discipline) so both
    engines walk one deterministic sequence; the share is one rounded
    division.

    100 TB posture: ONE user_id window exchange produces the lag; the
    rollup is a (|types|²)-group partial agg and the row-probability
    window runs over that bounded matrix."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    g = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return g.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp), 6
        ).alias("p_next"),
    )


@register(
    "q_attribution_linear",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, event_id,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS grp
      FROM events),
    touches AS (
      SELECT user_id, grp, event_type, COUNT(*) AS c
      FROM seq WHERE event_type IN ('view', 'click')
      GROUP BY user_id, grp, event_type),
    ks AS (
      SELECT user_id, grp, SUM(c) AS k FROM touches
      GROUP BY user_id, grp),
    purch AS (
      SELECT DISTINCT user_id, grp FROM seq
      WHERE event_type = 'purchase'),
    credit AS (
      SELECT t.event_type AS attributed,
             CAST(SUM(t.c) AS BIGINT) AS n_touches,
             SUM(t.c * CAST(ROUND(1.0 / ks.k, 6) AS DECIMAL(18,6)))
                 AS credit_dec
      FROM touches t
      JOIN ks ON ks.user_id = t.user_id AND ks.grp = t.grp
      JOIN purch p ON p.user_id = t.user_id AND p.grp = t.grp
      GROUP BY t.event_type)
    SELECT attributed, n_touches,
           CAST(credit_dec AS DOUBLE) AS credit
    FROM credit
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: every purchase
    spreads one unit of credit evenly over ALL the user's touch events
    (view/click) since their previous purchase — the multi-touch
    counterpart to q_attribution_last_touch (which hands the whole unit
    to the final touch).  Touch groups form by a running purchase count
    over the ordered per-user sequence (the strictly-before frame puts
    each purchase at the CLOSE of its own group); groups with no
    closing purchase earn nothing (inner join against the purchase
    spine).

    Cross-engine exactness: per-touch credit 1/k is rounded to 6 and
    CARRIED AS DECIMAL (the q_agg_entropy discipline) so the grouped
    sums are associative and order-free; ties order on event_id.

    100 TB posture: the user_id window runs EXACTLY ONCE — its single
    consumer is the (user, grp, type) count rollup, which is
    localCheckpointed because THREE downstream branches (touch counts,
    group sizes, the purchase spine) consume it and AQE would
    otherwise replay the corpus window per broadcast stage (the named
    no-cross-stage-reuse trap — this op's first draft measured the
    window 3x in its final plan; the pin below holds it at 1).  The
    checkpointed relation is (user x purchase-epoch x type)-bounded —
    orders of magnitude smaller than events; everything after it keys
    on (user, grp) and the final rollup is |types| groups."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_type",
        F.count(
            F.when(F.col("event_type") == "purchase", F.lit(1))
        )
        .over(w)
        .alias("grp"),
    )
    cnt = (
        seq.groupBy("user_id", "grp", "event_type")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    touches = cnt.filter(F.col("event_type").isin("view", "click"))
    ks = touches.groupBy("user_id", "grp").agg(F.sum("c").alias("k"))
    purch = (
        cnt.filter(F.col("event_type") == "purchase")
        .select("user_id", "grp")
        .distinct()
    )
    credit = (
        touches.join(ks, ["user_id", "grp"])
        .join(purch, ["user_id", "grp"])
        .groupBy(F.col("event_type").alias("attributed"))
        .agg(
            F.sum("c").alias("n_touches"),
            F.sum(
                F.col("c")
                * F.round(F.lit(1.0) / F.col("k"), 6).cast("decimal(18,6)")
            ).alias("credit_dec"),
        )
    )
    return credit.select(
        "attributed",
        "n_touches",
        F.col("credit_dec").cast("double").alias("credit"),
    )


@register(
    "q_win_streaks",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM ud),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM isl GROUP BY user_id, island),
    best AS (SELECT user_id, MAX(len) AS max_streak
             FROM streaks GROUP BY user_id)
    SELECT max_streak,
           COUNT(*) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS ids_sum
    FROM best GROUP BY max_streak
    """,
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, histogrammed —
    the GAPS-AND-ISLANDS pattern (the one classic relational idiom the
    surface still lacked): island key = day minus the per-user day
    rank, so consecutive days share a key and any gap starts a new
    island.  ids_sum pins that both engines put the SAME users in each
    streak bucket.

    Cross-engine exactness: pure integer date arithmetic and counts;
    DISTINCT (user, day) first so same-day multi-activity can't split
    or extend a streak.

    100 TB posture: the corpus-sized stage is the DISTINCT (user, day)
    partial-agg pass; the island window partitions BY USER over that
    bounded relation, and the island/best/histogram rollups are all
    (user)- then |streak-length|-keyed — the window's user_id exchange
    is reused by the island rollup (same clustering)."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        F.date_sub(
            F.col("d"), F.row_number().over(w)
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return best.groupBy("max_streak").agg(
        F.count("*").alias("n_users"),
        F.sum("user_id").alias("ids_sum"),
    )


@register(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    cnt AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type)
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    consecutive event pair within a user's timeline (ordered by ts with
    event_id tiebreak), the count and row-normalized probability
    P(next=to | cur=from) — the input to every journey simulation /
    next-action model, and the generalization q_session_paths
    specializes to its top-k paths.

    Cross-engine exactness: counts are integers; the row
    normalization is one double division over integer sums, rounded 6.

    100 TB posture: the lead() window partitions PER USER (bounded
    state per task, the q_sessionize discipline), then one partial-agg
    shuffle onto the |types|² transition relation; the normalizing
    window runs over |types|² rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wf), 6).alias(
            "p"
        ),
    )


FUNNEL_TTC_FROM = "signup"
FUNNEL_TTC_TO = "purchase"


@register(
    "q_funnel_ttc",
    oracle=f"""
    WITH a AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = '{FUNNEL_TTC_FROM}' GROUP BY user_id),
    b AS (
      SELECT e.user_id,
             (epoch_us(MIN(e.ts)) - epoch_us(ANY_VALUE(a.t0))) // 1000000
                 AS ttc_sec
      FROM events e JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_TTC_TO}' AND e.ts > a.t0
      GROUP BY e.user_id)
    SELECT COUNT(*) AS n_converted,
           CAST(MIN(ttc_sec) AS BIGINT) AS min_sec,
           ROUND(quantile_cont(ttc_sec, 0.5), 6) AS p50_sec,
           ROUND(quantile_cont(ttc_sec, 0.9), 6) AS p90_sec,
           CAST(MAX(ttc_sec) AS BIGINT) AS max_sec
    FROM b
    """,
)
def q_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the {FUNNEL_TTC_FROM} →
    {FUNNEL_TTC_TO} funnel: per user, seconds from the FIRST
    {FUNNEL_TTC_FROM} to the first LATER {FUNNEL_TTC_TO}, summarized
    as count / min / p50 / p90 / max — the latency companion to
    q_funnel_stages' conversion counts (how MANY convert) answering
    how FAST they convert.

    Cross-engine exactness: the latency is computed in EXACT
    MICROSECOND integers — unix_micros diff then integral div by 1e6
    on both sides.  (First draft truncated each timestamp to seconds
    BEFORE subtracting on the Spark side while the oracle truncated
    the difference: floor(a)−floor(b) ≠ floor(a−b) on the
    microsecond-precision ts column — caught by the sf1 sweep, an
    off-by-one on min_sec.)  The two interpolated percentiles follow
    the q_agg_percentile precedent (PERCENTILE_CONT semantics both
    sides, rounded 6).

    100 TB posture: two filtered partial-agg passes (each pushes an
    event_type predicate to the scan) joined per-user — the first-stage
    relation broadcasts when small and shuffles cleanly otherwise; the
    summary is a global agg onto one row with mergeable state."""
    e = load_table(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == FUNNEL_TTC_FROM)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    b = (
        e.filter(F.col("event_type") == FUNNEL_TTC_TO)
        .join(a, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(unix_micros(min(ts)) - unix_micros(any_value(t0)))"
                " div 1000000"
            ).alias("ttc_sec")
        )
    )
    return b.agg(
        F.count("*").alias("n_converted"),
        F.min("ttc_sec").alias("min_sec"),
        F.round(F.percentile("ttc_sec", 0.5), 6).alias("p50_sec"),
        F.round(F.percentile("ttc_sec", 0.9), 6).alias("p90_sec"),
        F.max("ttc_sec").alias("max_sec"),
    )


@register(
    "q_win_median",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, n,
           CAST(median(n) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS med7
    FROM d
    """,
)
def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median of the trailing-7-day daily event count per
    type — the robust twin of q_win_moving_avg (a single spike day
    moves the trailing mean by spike/7; it moves this median by at
    most one order statistic).  Spark has no median window function,
    so the frame is materialized per row (collect_list over ROWS
    BETWEEN 6 PRECEDING AND CURRENT ROW — at most 7 elements),
    array_sorted, and the median picked positionally: odd frames take
    element (s+1)/2, even frames (the first six rows of each
    partition) average the two central elements — exactly DuckDB's
    windowed median interpolation.

    Cross-engine exactness: daily counts are exact BIGINTs; an odd
    frame's median is an integer cast to double, an even frame's is
    (a+b)/2.0 — one IEEE addition and halving of exact integers, bit
    identical.  No rounding grain anywhere.

    100 TB posture: the corpus-sized stage is the (type, day)
    partial-agg count; the window runs on the CALENDAR-BOUNDED daily
    relation (|days| rows per type), and its state is the 7-element
    frame, constant per row.  The collect_list-then-sort trick is
    safe exactly BECAUSE the frame is O(1) — on an unbounded frame
    it would be the q_agg_mad bounded-cardinality caveat instead."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("n").over(w))
    s = F.size(arr)
    med = F.when(
        s % 2 == 1,
        F.element_at(arr, ((s + 1) / 2).cast("int")).cast("double"),
    ).otherwise(
        (
            F.element_at(arr, (s / 2).cast("int"))
            + F.element_at(arr, (s / 2).cast("int") + 1)
        ).cast("double")
        / 2
    )
    return d.select("event_type", "day", "n", med.alias("med7"))
