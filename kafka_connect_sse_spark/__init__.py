"""kafka_connect_sse_spark — a PySpark-native analytics engine with the
capabilities of the `cjmatta/kafka-connect-sse` reference connector, rebuilt
Spark-first (DataFrame / SQL / Catalyst / Structured Streaming).

The reference (read-only at /root/reference) is a Kafka Connect SSE *source
connector*; its capability surface = SSE ingest (Java tier), config-invoked
transforms (Connect SMT tier), and the SQL-on-stream surface its docker-compose
ksqlDB deployment exists to feed.  See SURVEY.md for the full derivation.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC)
    io.py         table loading over the driver-generated parquet fixtures
    registry.py   (query, oracle-SQL) registry backing __spark_entry__.py
    sources/      custom SSE streaming DataSource (wire parser, backoff, health)
    operators/    relational + LLM-pipeline operator library
    functions/    scalar-function surface
    streaming/    structured-streaming operators (windows, dedup, DLQ, observe)
    plans/        plan inspection / partitioning / skew helpers
"""

__version__ = "0.1.0"
