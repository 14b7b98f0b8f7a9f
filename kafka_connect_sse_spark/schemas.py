"""Schema definitions for the reference's data model.

SSE_ENVELOPE_SCHEMA: the fixed 3-field Connect envelope
(ServerSentEvent.java:29-34 — event required, id optional, data required).

RECENTCHANGE_SCHEMA: typed transcription of the Wikimedia
`mediawiki/recentchange` payload the reference's deployment parses via the
FromJson SMT (config/wikimedia.recentchange.schema.json:12-195; hand-typed
Connect schema wikipedia-edit-connect-schema.json:1-131).  Decisions:
  * `log_params` stays StringType — the JSON-Schema declares it a
    polymorphic array|object|string union (:180-188), which has no Spark
    type; keep raw JSON, parse on demand.
  * `meta.dt` is ISO-8601 text → parse with to_timestamp; `timestamp` is
    epoch seconds → timestamp_seconds (schema.json:41-46, :86-89).
  * integer/"null" unions become nullable LongType; 32-bit fields from the
    Connect schema (namespace) stay IntegerType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SSE_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("event", T.StringType(), nullable=False),
        T.StructField("id", T.StringType(), nullable=True),
        T.StructField("data", T.StringType(), nullable=False),
    ]
)

RECENTCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("$schema", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("uri", T.StringType()),
                    T.StructField("request_id", T.StringType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("dt", T.StringType()),  # ISO-8601
                    T.StructField("domain", T.StringType()),
                    T.StructField("stream", T.StringType()),
                ]
            ),
        ),
        T.StructField("id", T.LongType()),  # rcid, nullable union
        T.StructField("type", T.StringType()),  # edit|new|log|categorize|external
        T.StructField("title", T.StringType()),
        T.StructField("namespace", T.IntegerType()),
        T.StructField("comment", T.StringType()),
        T.StructField("parsedcomment", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds
        T.StructField("user", T.StringType()),
        T.StructField("bot", T.BooleanType()),
        T.StructField("server_url", T.StringType()),
        T.StructField("server_name", T.StringType()),
        T.StructField("server_script_path", T.StringType()),
        T.StructField("wiki", T.StringType()),
        T.StructField("minor", T.BooleanType()),
        T.StructField("patrolled", T.BooleanType()),
        T.StructField(
            "length",
            T.StructType(
                [T.StructField("old", T.LongType()), T.StructField("new", T.LongType())]
            ),
        ),
        T.StructField(
            "revision",
            T.StructType(
                [T.StructField("old", T.LongType()), T.StructField("new", T.LongType())]
            ),
        ),
        T.StructField("log_id", T.LongType()),
        T.StructField("log_type", T.StringType()),
        T.StructField("log_action", T.StringType()),
        T.StructField("log_params", T.StringType()),  # polymorphic: keep raw
        T.StructField("log_action_comment", T.StringType()),
    ]
)


def parse_recentchange(envelope: DataFrame, data_col: str = "data") -> DataFrame:
    """The reference's SMT chain as one declarative plan:
    ExtractField(data) → FromJson(schema, validation off / PERMISSIVE) →
    typed event-time columns (kafka-connect-sse.properties:9-16).

    Emits the parsed payload columns plus `event_time` (from meta.dt),
    `change_ts` (from epoch `timestamp`), and `rc_valid` — PERMISSIVE
    from_json turns malformed JSON into an all-null struct, so validity is
    detected explicitly (try_parse_json) for DLQ routing (Tier 2 #18)."""
    j = F.from_json(F.col(data_col), RECENTCHANGE_SCHEMA)
    return (
        envelope.withColumn("rc", j)
        .withColumn(
            "rc_valid", F.expr(f"try_parse_json({data_col})").isNotNull()
        )
        .withColumn("event_time", F.to_timestamp(F.col("rc.meta.dt")))
        .withColumn("change_ts", F.timestamp_seconds(F.col("rc.timestamp")))
    )
