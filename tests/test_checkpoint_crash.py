"""Crash-injection for checkpointed streaming (VERDICT r4 item 7).

s_checkpoint_resume proves clean-stop resume; this file proves the
harder property: a query KILLED MID-BATCH — after the sink already wrote
partial output for that batch — must, on restart from the same
checkpoint, replay the failed batch and land every row EXACTLY ONCE.

Two layers are under test:
  * checkpoint replay: the restarted query re-runs the failed epoch, so
    nothing is lost (failing this halves the row count);
  * sink idempotence: the foreachBatch sink keys each write by batchId
    and overwrites, so the crashed attempt's partial files are replaced,
    not appended to (failing this duplicates rows).

This is the foreachBatch idempotent-write pattern the Structured
Streaming guide prescribes for exactly-once file sinks, staged with a
deterministic mid-batch bomb: the first attempt of the final batch
writes a PARTIAL half-batch to the sink directory and then raises —
exactly the torn state a mid-batch executor loss leaves behind.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from kafka_connect_sse_spark.io import load_table, scratch_dir

SF_DIR = "/root/testdata/sf0.001"


def test_mid_batch_crash_replays_exactly_once(spark):
    base = scratch_dir("kcss_ckpt_crash")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "sink")
    shutil.rmtree(base, ignore_errors=True)

    e = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    schema = e.schema
    total = e.count()

    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    bombed = {"armed": True}

    def land(df, batch_id: int) -> None:
        out = os.path.join(sink, f"batch={batch_id}")
        if batch_id == 1 and bombed["armed"]:
            bombed["armed"] = False
            # torn write: half the batch lands, then the "executor" dies.
            # mode=overwrite on a batchId-keyed path is what makes the
            # replay idempotent — the retry replaces this torn state.
            df.limit(df.count() // 2).write.mode("overwrite").parquet(out)
            raise RuntimeError("injected mid-batch crash after partial write")
        df.write.mode("overwrite").parquet(out)

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    # first run dies mid-batch-1 with partial output on disk
    with pytest.raises(StreamingQueryException, match="injected mid-batch"):
        run()
    torn = spark.read.parquet(os.path.join(sink, "batch=1")).count()
    assert 0 < torn < total // 2 + 1  # the tear is real before restart

    # restart from the same checkpoint: batch 1 replays, overwrite heals
    run()

    landed = spark.read.parquet(sink)
    assert landed.count() == total  # no loss (replay) and no dup (idempotent)
    assert landed.select("event_id").distinct().count() == total
    # and the batch the crash tore is now complete
    healed = spark.read.parquet(os.path.join(sink, "batch=1")).count()
    assert healed > torn


def test_mid_batch_crash_without_idempotence_duplicates(spark):
    """Negative control: an APPEND-mode sink (no batchId keying) under the
    same crash DOES duplicate the torn rows — proving the assertion above
    actually discriminates, and documenting why the landing sinks key by
    batch."""
    base = scratch_dir("kcss_ckpt_crash_neg")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "sink")
    shutil.rmtree(base, ignore_errors=True)

    e = load_table(spark, SF_DIR, "events").select("event_id").filter(
        F.col("event_id") < 100
    )
    schema = e.schema
    e.coalesce(1).write.mode("overwrite").parquet(src)

    bombed = {"armed": True}

    # deterministic halves (limit() without orderBy has no stable subset)
    def land(df, batch_id: int) -> None:
        df.filter(F.col("event_id") < 50).write.mode("append").parquet(sink)
        if bombed["armed"]:
            bombed["armed"] = False
            raise RuntimeError("injected")
        df.filter(F.col("event_id") >= 50).write.mode("append").parquet(sink)

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    with pytest.raises(StreamingQueryException, match="injected"):
        run()
    run()
    # the torn 50 rows landed twice: append-mode replay is NOT exactly-once
    assert spark.read.parquet(sink).count() == 150
