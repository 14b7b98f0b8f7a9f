"""Projection / filter / predicate operators (SURVEY.md §2.4).

These reproduce the reference's per-record transform semantics Spark-first:
the Connect SMT chain `ExtractField → FromJson` (config/kafka-connect-sse
.properties:9-16) is projection + parsing; the null-name drop
(ServerSentEventClient.java:523-530) and null-coalescing defaults
(ServerSentEventsSourceTask.java:111-114) are filters/coalesce.  All are
declarative DataFrame ops so Catalyst fuses the whole chain into one
WholeStageCodegen stage and pushes predicates into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "src_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem
    """,
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parquet scan of a full table (columnar, vectorized reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )


@register(
    "q_project_rename",
    oracle="""
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           l_returnflag AS flag, l_quantity AS qty
    FROM lineitem
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename; column pruning reaches the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "q_project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
           'O' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
               AS line_key
    FROM lineitem
    """,
)
def q_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic + string concat (TPC-H Q1-style terms)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # rounding grain ≥ true decimal precision of the product (2dp×2dp=4dp,
        # ×2dp=6dp): on-grid rounding is the only form both engines agree on
        # for doubles (Spark rounds the shortest decimal repr, DuckDB the
        # binary value — off-grid ties diverge)
        F.round(net, 4).alias("net_price"),
        F.round(net * (F.lit(1) + F.col("l_tax")), 6).alias("charge"),
        F.concat(
            F.lit("O"), F.col("l_orderkey").cast("string"),
            F.lit("-"), F.col("l_linenumber").cast("string"),
        ).alias("line_key"),
    )


@register(
    "q_filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount <= 0.05) OR l_returnflag = 'R'
    """,
)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates + boolean connectives, pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05)) | (
        F.col("l_returnflag") == "R"
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "q_filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 150000
    """,
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN range predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000, 150000)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL under 3-valued logic (nulls minted via NULLIF — the
    fixtures carry no natural nulls)."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.withColumn("status_or_null", status_or_null)
        .filter(F.col("status_or_null").isNotNull())
        .select("o_orderkey", "o_orderstatus", "status_or_null")
    )


@register(
    "q_filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%red%' OR regexp_matches(p_type, '^STANDARD.*BRASS$')
    """,
)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex predicates (the reference's planned event-name pattern
    filter, ServerSentEventsSourceConnectorConfig.java:30 TODO)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%") | F.col("p_type").rlike("^STANDARD.*BRASS$")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q_coalesce_defaults",
    oracle="""
    SELECT e.event_id,
           COALESCE(NULLIF(e.event_type, 'view'), 'unknown') AS event_coalesced,
           COALESCE(NULLIF(e.props, '{}'), '') AS data_coalesced
    FROM events e
    """,
)
def q_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-default coalescing — mirrors the reference's
    `event==null → "unknown"`, `data==null → ""` defaults
    (ServerSentEventsSourceTask.java:111-114)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("unknown"))
        .alias("event_coalesced"),
        F.coalesce(F.nullif(F.col("props"), F.lit("{}")), F.lit("")).alias(
            "data_coalesced"
        ),
    )


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination (partial-aggregate dedup before the shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_lateral_explode",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l
               FROM documents WHERE doc_id < 40)
    SELECT doc_id, g.i AS pos, l[g.i] AS tok
    FROM t, UNNEST(generate_series(1, len(l))) AS g(i)
    """,
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explosion with ordinality (posexplode) — the
    table-function surface for array-valued payloads.  The explode runs
    inside the same stage as the scan (generator node, no shuffle); the
    1-based position matches SQL ordinality."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok"
    )


@register(
    "q_profile_columns",
    oracle="""
    WITH p AS (
      SELECT 'event_id' AS col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
             CAST(MIN(event_id) AS VARCHAR) AS min_s,
             CAST(MAX(event_id) AS VARCHAR) AS max_s
      FROM events
      UNION ALL
      SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
             COUNT(DISTINCT user_id),
             CAST(MIN(user_id) AS VARCHAR),
             CAST(MAX(user_id) AS VARCHAR)
      FROM events
      UNION ALL
      SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
             COUNT(DISTINCT event_type),
             MIN(event_type), MAX(event_type)
      FROM events
      UNION ALL
      SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
             COUNT(DISTINCT ts),
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')
      FROM events
      UNION ALL
      SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
             COUNT(DISTINCT CAST(CAST(value AS DECIMAL(18,2)) * 100
                                 AS BIGINT)),
             CAST(CAST(CAST(MIN(value) AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS VARCHAR),
             CAST(CAST(CAST(MAX(value) AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS VARCHAR)
      FROM events)
    SELECT * FROM p
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality census every warehouse ships
    (row count, null count, distinct cardinality, min/max) over the
    events table's typed columns, ONE corpus pass: the operational
    sibling of x_data_contract (which asserts; this DESCRIBES, and its
    output is what you write the contract from).

    Mechanics: all per-column metrics compute in a single multi-distinct
    aggregate (Catalyst Expands the distinct sets — one scan, k-way
    partial aggs), then unpivot to one row per column via stack().
    Values emit on the cent grid, timestamps as formatted strings, so
    every min/max is an exact string on both engines.

    100 TB posture: the Expand for k distinct columns replicates the
    scan k-way BEFORE the shuffle (the documented cost of exact
    multi-column NDV in one pass — swap in approx_count_distinct per
    column when exact cardinality isn't the point); everything lands
    on k single-row aggregates."""
    from ..plans import spread

    # spread(): the 5-way Expand + partial distinct maps are the whole
    # cost and run map-side — single-core on a one-task scan otherwise
    ev = spread(load_table(spark, sf_dir, "events"), "event_id")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    m = ev.agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.count("*") - F.count("event_id")).cast("long").alias("id_null"),
        F.countDistinct("event_id").cast("long").alias("id_nd"),
        F.min("event_id").cast("string").alias("id_min"),
        F.max("event_id").cast("string").alias("id_max"),
        (F.count("*") - F.count("user_id")).cast("long").alias("u_null"),
        F.countDistinct("user_id").cast("long").alias("u_nd"),
        F.min("user_id").cast("string").alias("u_min"),
        F.max("user_id").cast("string").alias("u_max"),
        (F.count("*") - F.count("event_type"))
        .cast("long")
        .alias("t_null"),
        F.countDistinct("event_type").cast("long").alias("t_nd"),
        F.min("event_type").alias("t_min"),
        F.max("event_type").alias("t_max"),
        (F.count("*") - F.count("ts")).cast("long").alias("ts_null"),
        F.countDistinct("ts").cast("long").alias("ts_nd"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_min"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_max"),
        (F.count("*") - F.count("value")).cast("long").alias("v_null"),
        F.countDistinct(cents).cast("long").alias("v_nd"),
        F.min(cents).cast("string").alias("v_min"),
        F.max(cents).cast("string").alias("v_max"),
    )
    return m.selectExpr(
        """stack(5,
             'event_id',  n_rows, id_null, id_nd, id_min, id_max,
             'user_id',   n_rows, u_null,  u_nd,  u_min,  u_max,
             'event_type',n_rows, t_null,  t_nd,  t_min,  t_max,
             'ts',        n_rows, ts_null, ts_nd, ts_min, ts_max,
             'value',     n_rows, v_null,  v_nd,  v_min,  v_max)
           AS (col_name, n_rows, n_null, n_distinct, min_s, max_s)"""
    )
