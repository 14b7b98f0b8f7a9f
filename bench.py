"""Benchmark harness (BASELINE.md §2 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], AQE on, UTC, and prints
ONE JSON line:

    {"metric": "total_median_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Per query: two warm-up runs then median of 3 timed runs (collect() to force
full materialization, count only as a fallback for huge outputs).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: the scale-critical operators across every tier
HEADLINE = [
    "q_agg_groupby",          # TPC-H Q1-style scan+agg
    "q_join_multiway",        # 5-table star join
    "q_join_inner_shuffle",   # fact-fact shuffle join
    "q_agg_count_distinct",   # expand + two-phase distinct
    "q_win_ranking",          # partitioned window sort
    "q_topk_per_group",       # ranked top-k
    "q_limit_topk",           # global top-k
    "q_agg_grouping_sets",    # multi-grouping aggregate
    "q_fn_json",              # JSON path extraction (SMT tier)
    "x_text_stats",           # token stats over documents
    "x_dedup_exact_hash",     # content-hash dedup
    "x_dedup_near_minhash",   # MinHash LSH + verify
    "x_sim_topk_cosine",      # brute-force cosine top-k
    "x_fingerprint",          # posexplode fingerprint
    "u_pandas_udf",           # Arrow-vectorized UDF
]

# round-4 additions: timed and recorded in "queries" like the headline
# set, but kept OUT of the headline total ("value") so the total stays
# apples-to-apples with BASELINE.md's round-1 protocol; their sum is
# reported separately as "extra_total_sec" (BASELINE.md §Round-4).
EXTRA = [
    "x_seq_pack",             # two-level sequence packing (window + bcast)
    "x_corpus_prep",          # composite quality->dedup->balance->pack
    "q_join_bloom_prune",     # runtime bloom scan-prune + exact verify
    "x_ann_rerank",           # int8 shortlist + fp64 re-rank ANN
]

RUNS = 3
# two warm-up runs per query: one is not enough for the heaviest operators
# (x_dedup_near_minhash spans dozens of codegen stages + an eager
# localCheckpoint; its second run is still JIT-warming, which showed up as
# 2x run-to-run variance in round 2/3 probes)
WARMUPS = 2
# outputs larger than this are forced via count() instead of collect(), so
# the bench measures engine execution, not Python row deserialization
COLLECT_CAP_ROWS = 100_000

N_INGEST_EVENTS = 50_000


def sse_ingest_bench(spark, n_events: int = N_INGEST_EVENTS,
                     name: str = "bench_sse_ingest") -> float:
    """Ingest throughput of the custom SSE source: serve N synthetic events
    over a localhost socket, measure wall-clock until all are landed in a
    memory sink.  (The reference's deployed rate is network-bound at tens
    of events/s — wikipedia-connector.json:10-13; this measures the
    engine-side ceiling.)"""
    import threading
    import time as _t
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from kafka_connect_sse_spark.sources.sse import register_sse_source

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            buf = []
            for i in range(n_events):
                buf.append(f"event: e\nid: {i}\ndata: {{\"k\": {i}}}\n\n")
                if len(buf) >= 500:
                    self.wfile.write("".join(buf).encode())
                    buf = []
            self.wfile.write("".join(buf).encode())
            self.wfile.flush()
            try:
                for _ in range(600):
                    _t.sleep(0.1)
                    self.wfile.write(b": ka\n\n")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    register_sse_source(spark)
    t0 = time.perf_counter()
    sdf = (
        spark.readStream.format("sse")
        .option("uri", f"http://127.0.0.1:{srv.server_address[1]}/s")
        .option("maxEventsPerBatch", "100000")
        .option("sse.buffer.max", "200000")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        while spark.table(name).count() < n_events:
            if time.perf_counter() - t0 > 120:
                break
            time.sleep(0.2)
        dt = time.perf_counter() - t0
    finally:
        q.stop()
        srv.shutdown()
        srv.server_close()
    return dt


def streaming_latency_bench(spark, sf_dir: str, n_files: int = 8) -> dict:
    """Per-micro-batch latency of the stateful streaming tier (VERDICT r4
    item 8): stage the events table as n_files files, drive each stateful
    shape batch-by-batch (maxFilesPerTrigger=1, availableNow), and read
    the per-batch wall time straight off StreamingQueryProgress.
    Reported: median triggerExecution seconds over data-carrying batches
    for (a) the watermarked session-window aggregation and (b) the
    watermarked stream-stream left-outer join — the two shapes whose
    state store dominates streaming cost at scale."""
    import shutil
    import statistics as _st
    import tempfile

    from pyspark.sql import functions as _F

    from kafka_connect_sse_spark.io import load_table

    src = os.path.join(tempfile.gettempdir(), "kcss_bench_stream_src")
    shutil.rmtree(src, ignore_errors=True)
    e = load_table(spark, sf_dir, "events")
    e.withColumn("shard", _F.pmod("event_id", _F.lit(n_files))).repartition(
        n_files, "shard"
    ).drop("shard").write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def batches(build):
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            build(sdf)
            .writeStream.format("memory")
            .queryName(f"bench_lat_{id(build)}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if q.isActive:
            q.stop()
        durs = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in (json.loads(x.json) for x in q.recentProgress)
            if p["numInputRows"] > 0
        ]
        return round(_st.median(durs), 3) if durs else None

    def session_agg(sdf):
        return (
            sdf.withWatermark("ts", "10 minutes")
            .groupBy(_F.session_window("ts", "30 minutes"), "user_id")
            .agg(_F.count("*").alias("n_events"))
            .select("user_id", "n_events")
        )

    def outer_join(sdf):
        purchases = (
            sdf.filter(_F.col("event_type") == "purchase")
            .select(
                _F.col("event_id").alias("purchase_id"),
                "user_id",
                _F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "30 minutes")
        )
        clicks = (
            sdf.filter(_F.col("event_type") == "click")
            .select(
                _F.col("event_id").alias("click_id"),
                _F.col("user_id").alias("c_user_id"),
                _F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "30 minutes")
        )
        return purchases.join(
            clicks,
            _F.expr(
                "user_id = c_user_id AND "
                "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
            ),
            "leftOuter",
        ).select("purchase_id", "click_id", "user_id")

    out = {
        "s_window_session_p50_batch_sec": batches(session_agg),
        "s_join_stream_outer_p50_batch_sec": batches(outer_join),
    }
    shutil.rmtree(src, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="kcss-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    sf = None
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        pass

    def run_query(name: str) -> float:
        fn = qs[name]
        times = []
        for i in range(RUNS + WARMUPS):  # leading runs are warm-up
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            if n <= COLLECT_CAP_ROWS:
                df.collect()
            dt = time.perf_counter() - t0
            if i >= WARMUPS:
                times.append(dt)
        med = round(statistics.median(times), 3)
        print(f"# {name}: {med}s (n={n})", file=sys.stderr)
        return med

    results: dict[str, float] = {}
    for name in HEADLINE:
        results[name] = run_query(name)

    # same protocol as the batch queries: one warm-up run (tiny event
    # count — first streaming query pays one-time class-loading and
    # Python-data-source bridge startup), then median of RUNS timed runs
    # (a single timed run showed 2x swings round-to-round: 3.1 s vs 6.1 s
    # probes with identical code)
    sse_ingest_bench(spark, n_events=2_000, name="bench_sse_warmup")
    ingest_sec = round(
        statistics.median(
            sse_ingest_bench(spark, name=f"bench_sse_{i}") for i in range(RUNS)
        ),
        3,
    )
    results["sse_ingest_50k_events"] = ingest_sec
    print(
        f"# sse_ingest: {N_INGEST_EVENTS} events in {ingest_sec}s "
        f"(~{int(N_INGEST_EVENTS / max(ingest_sec, 1e-9))} ev/s)",
        file=sys.stderr,
    )

    total = round(sum(results.values()), 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        extra[name] = run_query(name)

    lat = streaming_latency_bench(spark, sf_dir)
    for k, v in lat.items():
        print(f"# {k}: {v}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_median_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": {**results, **extra},
                "extra_total_sec": round(sum(extra.values()), 3),
                "streaming_latency": lat,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
