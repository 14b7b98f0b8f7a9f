"""A/B: stream-stream outer join per-batch latency vs shuffle-partition
count (VERDICT r9 item 6).  The bench drives ~12.5k-event micro-batches;
a watermarked stream-stream join instantiates FOUR state stores per
shuffle partition (keyToNumValues + keyWithIndexToValue per side), each
paying commit/snapshot overhead EVERY batch regardless of row volume —
so at small per-batch volume the partition count, not the data, can be
the floor.  This experiment measures the p50 per-batch wall for the
exact bench join shape under decreasing state-partition counts, default
and RocksDB providers.

    python tools/ab_stream_join.py
"""

from __future__ import annotations

import json
import shutil
import statistics as st
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"
N_FILES = 8


def run(spark, src, schema) -> float | None:
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    purchases = (
        sdf.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    clicks = (
        sdf.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    out = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id AND "
            "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName(f"ab_sj_{id(out)}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.isActive:
        q.stop()
    progress = [json.loads(x.json) for x in q.recentProgress]
    durs = [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in progress
        if p["numInputRows"] > 0
    ]
    return round(st.median(durs), 3) if durs else None


def main() -> None:
    from kafka_connect_sse_spark.io import load_table, scratch_dir
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="ab-stream-join")
    spark.sparkContext.setLogLevel("ERROR")
    src = scratch_dir("kcss_ab_sj_src")
    shutil.rmtree(src, ignore_errors=True)
    e = load_table(spark, SF, "events")
    e.withColumn("shard", F.pmod("event_id", F.lit(N_FILES))).repartition(
        N_FILES, "shard"
    ).drop("shard").write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    results = {}
    try:
        for parts in (32, 16, 8, 4, 2):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            results[f"default_p{parts}"] = run(spark, src, schema)
            spark.conf.set(provider_key, rocksdb)
            try:
                results[f"rocksdb_p{parts}"] = run(spark, src, schema)
            finally:
                spark.conf.unset(provider_key)
            print(parts, results[f"default_p{parts}"],
                  results[f"rocksdb_p{parts}"], flush=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    print(json.dumps(results))
    with open("/root/repo/tools/ab_stream_join_results.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
