"""RocksDB state store provider — the production state backend at scale.

The default HDFSBackedStateStoreProvider keeps every state row on the
executor heap; at 100 TB-streaming state sizes (billions of keys) the
production deployment switches to RocksDBStateStoreProvider, which spills
state off-heap/to disk with the same exactly-once checkpoint contract.
This test proves the engine's stateful shapes are provider-agnostic:
the SAME watermarked windowed aggregation, run under both providers,
produces identical results — and the RocksDB run demonstrably used
RocksDB (its checkpoint state dir holds zipped RocksDB snapshots, not
the HDFS provider's .delta files).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from kafka_connect_sse_spark.io import scratch_dir
from kafka_connect_sse_spark.streaming.runner import events_stream

SF = "/root/testdata/sf0.001"
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _run_windowed_agg(spark, ckpt: str) -> dict:
    sdf = events_stream(spark, SF)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("w"),
            "event_type",
            "n",
        )
    )
    name = f"state_provider_{os.path.basename(ckpt)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    return {
        (r["w"], r["event_type"]): r["n"]
        for r in spark.table(name).collect()
    }


def test_rocksdb_state_store_matches_default_provider(spark):
    base = scratch_dir("kcss_rocksdb_state")
    shutil.rmtree(base, ignore_errors=True)
    prev = spark.conf.get(PROVIDER_KEY, None)
    try:
        # default (HDFS-backed, on-heap) provider
        default_res = _run_windowed_agg(spark, os.path.join(base, "dflt"))
        # RocksDB provider — the conf is read at query start
        spark.conf.set(PROVIDER_KEY, ROCKSDB)
        rocks_res = _run_windowed_agg(spark, os.path.join(base, "rocks"))
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prev)

    # identical answers under both providers
    assert rocks_res == default_res and default_res

    # and each run demonstrably used its provider: the HDFS-backed store
    # snapshots state as .delta files; RocksDB checkpoints zipped SST
    # snapshots (.zip / .changelog) and never writes .delta
    dflt_state = glob.glob(os.path.join(base, "dflt", "state", "**"),
                           recursive=True)
    rocks_state = glob.glob(os.path.join(base, "rocks", "state", "**"),
                            recursive=True)
    assert any(p.endswith(".delta") for p in dflt_state), dflt_state[:20]
    assert not any(p.endswith(".delta") for p in rocks_state), (
        rocks_state[:20]
    )
    assert any(p.endswith((".zip", ".changelog")) for p in rocks_state), (
        rocks_state[:20]
    )
