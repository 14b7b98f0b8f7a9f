"""Run-to-completion harness for streaming operators.

The driver's correctness gate collects plain DataFrames, so each streaming
operator here runs its StreamingQuery to completion (availableNow) against a
file stream of the fixture events and returns the materialized result from a
memory sink — real Structured Streaming execution with a deterministic,
batch-equivalent answer (the STREAM check class of SURVEY.md §2.4, upgraded
to EXACT where an oracle is expressible).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table, table_path

_counter = itertools.count()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture events table as a bounded file stream (schema from the
    batch reader; single parquet file ⇒ one deterministic micro-batch)."""
    schema = load_table(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .parquet(table_path(sf_dir, "events"))
    )


def run_to_memory(
    sdf: DataFrame,
    mode: str = "complete",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Execute a streaming DataFrame with trigger(availableNow) into a
    uniquely named memory sink; return the sink contents as a batch DF."""
    name = f"stream_sink_{next(_counter)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    return sdf.sparkSession.table(name)
