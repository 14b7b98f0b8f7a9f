"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in ``kafka_connect_sse_spark`` (registry.py pairs every
query with its oracle); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_sse_spark import registry
from kafka_connect_sse_spark.io import load_table

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 M1 slice): the reference's whole pipeline
    semantics in one plan — envelope defaults → JSON payload extraction →
    event-time tumbling window aggregate → top-k windows by volume."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load_table(spark, SF_SMOKE_DIR, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        e.select(
            F.coalesce(F.col("event_type"), F.lit("unknown")).alias("event"),
            F.coalesce(F.col("props"), F.lit("")).alias("data"),
            F.col("ts"),
            k.alias("k"),
        )
        .filter(F.col("event").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event",
            "n_events",
            "k_sum",
        )
        .orderBy(F.col("n_events").desc(), F.col("win_start"), F.col("event"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.4."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every EXACT-checked operator."""
    return registry.oracle_sql()
