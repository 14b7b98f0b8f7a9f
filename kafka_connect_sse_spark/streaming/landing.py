"""Landing-zone topology: SSE → raw parquet (replayable) → analytics.

The live SSE source is non-replayable by protocol (no offsets:
README.md:175-184, IMPROVEMENT_PLAN.md:39-42) — exactly like the reference,
which solves durability by producing to Kafka.  This engine's equivalent is
landing raw events to parquet immediately; every analytical query then runs
over storage with full replay.  `snk_sse_landing` demonstrates the whole
topology end-to-end against a live local SSE server.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import scratch_dir
from ..registry import register
from ..sources.sse import register_sse_source


def land_sse_to_parquet(
    spark: SparkSession,
    uri: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: float = 0.5,
    options: dict | None = None,
    partition_by: list[str] | None = None,
):
    """Start the landing stream: SSE source → append-mode parquet sink with
    a checkpoint (exactly-once file sink semantics).  `partition_by` (e.g.
    ["event"]) gives the landing zone a partition-pruned layout — the
    storage posture SCALE.md assumes.  Returns the running StreamingQuery;
    caller owns its lifecycle."""
    register_sse_source(spark)
    reader = spark.readStream.format("sse").option("uri", uri)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    sdf = reader.load()
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=f"{int(trigger_seconds * 1000)} milliseconds")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()


@register(
    "snk_sse_landing",
    oracle="""
    SELECT event_type AS event, COUNT(*) AS n,
           CAST(SUM(LENGTH(props)) AS BIGINT) AS data_bytes
    FROM events
    WHERE event_id < 200
    GROUP BY event_type
    """,
)
def snk_sse_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full landing topology under test: local SSE server streams 200
    fixture events → `sse` source → checkpointed parquet landing zone →
    batch analytics over the landed files."""
    from ..operators.sinks import _SSEHandler, _sse_payload_rows

    import threading
    from http.server import ThreadingHTTPServer

    rows = [r.asDict() for r in _sse_payload_rows(spark, sf_dir)]
    _SSEHandler.rows = rows
    server = ThreadingHTTPServer(("127.0.0.1", 0), _SSEHandler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    base = scratch_dir("kcss_landing")
    out = os.path.join(base, "raw_events")
    ckpt = os.path.join(base, "checkpoint")
    shutil.rmtree(base, ignore_errors=True)

    q = land_sse_to_parquet(
        spark, f"http://127.0.0.1:{port}/stream", out, ckpt
    )
    landed_n = 0
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            try:
                landed_n = (
                    spark.read.parquet(out).select("id").distinct().count()
                )
                if landed_n >= len(rows):
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
        server.shutdown()
        server.server_close()
    if landed_n < len(rows):
        # a stalled stream must fail loudly, not land a partial aggregate
        # that the driver gate would misread as a correctness bug
        raise TimeoutError(
            f"snk_sse_landing: landed {landed_n}/{len(rows)} distinct "
            "events before the 90s deadline"
        )

    # dedup on id: a mid-run reconnect re-serves the stub stream from
    # offset 0 (no Last-Event-ID resume), landing bit-identical duplicates
    landed = spark.read.parquet(out).dropDuplicates(["id"])
    return landed.groupBy(F.col("event")).agg(
        F.count("*").alias("n"),
        F.sum(F.length("data")).alias("data_bytes"),
    )


@register(
    "src_sse_multi",
    oracle="""
    SELECT CAST(event_id % 3 AS BIGINT) AS stream_id,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events
    WHERE event_id < 200
    GROUP BY 1
    """,
)
def src_sse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stream SSE fan-in: N endpoints → N independent readers →
    union → ONE checkpointed landing sink.

    The reference hard-caps ingest at a single task because one SSE
    socket is unsplittable (ServerSentEventsSourceConnector.java:61-63 —
    maxTasks forced to 1); its only scale lever is deploying more
    connectors.  The Spark posture is the same protocol fact with a
    different answer: scale SUBSCRIPTIONS, not the socket.  Each
    endpoint gets its own `sse` reader (own offsets, own reconnect
    machinery), the streams are unionByName'd with a stream_id tag, and
    a single checkpointed parquet sink lands the union exactly-once —
    one query, one checkpoint, one landing zone, N sockets draining in
    parallel.  Ingest bandwidth now scales linearly in the number of
    subscriptions while the downstream topology (landing → analytics)
    is unchanged from `snk_sse_landing`.  Here N=3 local servers each
    serve a disjoint shard (event_id % 3) of the same 200 fixture
    events; zero loss and zero cross-stream contamination are asserted
    by the oracle's per-shard count + id-sum."""
    from functools import reduce

    import threading
    from http.server import ThreadingHTTPServer

    from ..operators.sinks import _SSEHandler, _sse_payload_rows

    rows = [r.asDict() for r in _sse_payload_rows(spark, sf_dir)]
    shards = [[r for r in rows if r["event_id"] % 3 == i] for i in range(3)]
    servers = []
    for i, shard in enumerate(shards):
        # per-server handler subclass: `rows` is a CLASS attribute, so
        # sharing _SSEHandler itself would serve every server one list
        handler = type(f"_SSEMultiHandler{i}", (_SSEHandler,), {"rows": shard})
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)

    # key the scratch dir by pid: concurrent checkers (e.g. two sweeps at
    # different SFs) must not rmtree each other's running landing zone
    base = scratch_dir("kcss_sse_multi")
    out = os.path.join(base, "raw_events")
    ckpt = os.path.join(base, "checkpoint")
    shutil.rmtree(base, ignore_errors=True)

    register_sse_source(spark)
    streams = []
    for i, srv in enumerate(servers):
        port = srv.server_address[1]
        streams.append(
            spark.readStream.format("sse")
            .option("uri", f"http://127.0.0.1:{port}/stream")
            .load()
            .select("event", "id", "data")
            .withColumn("stream_id", F.lit(i).cast("long"))
        )
    union = reduce(lambda a, b: a.unionByName(b), streams)
    q = (
        union.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    landed_n = 0
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                landed_n = (
                    spark.read.parquet(out)
                    .select("stream_id", "id")
                    .distinct()
                    .count()
                )
                if landed_n >= len(rows):
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
        for srv in servers:
            srv.shutdown()
            srv.server_close()
    if landed_n < len(rows):
        # partial per-shard aggregates are indistinguishable from a real
        # correctness failure at the driver gate — fail loudly instead
        raise TimeoutError(
            f"src_sse_multi: landed {landed_n}/{len(rows)} distinct "
            "(stream_id, id) pairs before the 120s deadline"
        )

    # reconnects re-serve each stub stream from offset 0 → dedup per stream
    landed = spark.read.parquet(out).dropDuplicates(["stream_id", "id"])
    return landed.groupBy("stream_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("id").cast("long")).alias("id_sum"),
    )
