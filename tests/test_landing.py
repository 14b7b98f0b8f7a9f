"""Landing-zone integration: SSE → partitioned parquet with checkpoint."""

import os
import shutil
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafka_connect_sse_spark.io import scratch_dir
from kafka_connect_sse_spark.streaming.landing import land_sse_to_parquet

EVENTS = [("edit", i) for i in range(6)] + [("log", i) for i in range(6, 10)]


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        for ev, i in EVENTS:
            self.wfile.write(f"event: {ev}\nid: {i}\ndata: d{i}\n\n".encode())
        self.wfile.flush()
        try:
            for _ in range(300):
                time.sleep(0.1)
                self.wfile.write(b": ka\n\n")
                self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/s"
    srv.shutdown()
    srv.server_close()


def test_partitioned_landing_roundtrip(spark, server):
    base = scratch_dir("kcss_landing_test")
    shutil.rmtree(base, ignore_errors=True)
    out, ckpt = os.path.join(base, "raw"), os.path.join(base, "ckpt")
    q = land_sse_to_parquet(
        spark, server, out, ckpt, partition_by=["event"]
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                if spark.read.parquet(out).count() >= len(EVENTS):
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    landed = spark.read.parquet(out)
    assert landed.count() == len(EVENTS)
    # partitioned layout: one directory per event class
    dirs = {d for d in os.listdir(out) if d.startswith("event=")}
    assert dirs == {"event=edit", "event=log"}
    # replayable: a fresh batch read sees every event exactly once
    ids = sorted(int(r.id) for r in landed.collect())
    assert ids == list(range(10))
    shutil.rmtree(base, ignore_errors=True)


def test_checkpointed_file_landing_resumes_exactly_once(spark, tmp_path):
    """Restarting a checkpointed landing query must process ONLY files that
    arrived since the last run — no replays, no loss (the exactly-once
    file-sink contract that makes the landing zone replayable storage)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land_available():
        sdf = spark.readStream.schema("id long, v long").parquet(src)
        q = (
            sdf.withColumn("v2", F.col("v") + 1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.mode(
        "append"
    ).parquet(src)
    land_available()
    spark.range(100, 250).withColumn("v", F.col("id") * 2).write.mode(
        "append"
    ).parquet(src)
    land_available()

    back = spark.read.parquet(out)
    assert back.count() == 250
    assert back.select("id").distinct().count() == 250
    assert back.filter(F.col("v2") != F.col("id") * 2 + 1).count() == 0


def test_sse_multi_fanin_zero_loss_isolation_ordering(spark):
    """Multi-stream fan-in (src_sse_multi): N endpoints → union → ONE
    checkpointed landing.  Asserts, against the landed files themselves:
    zero loss (every served id landed), zero cross-stream contamination
    (each landed row carries the stream_id of the server that owns its
    shard), and — at the client tier — per-stream arrival ordering."""
    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.operators.sinks import _sse_payload_rows

    sf = "/root/testdata/sf0.001"
    out = queries()["src_sse_multi"](spark, sf).collect()
    rows = [r.asDict() for r in _sse_payload_rows(spark, sf)]
    expected = {
        i: [r["event_id"] for r in rows if r["event_id"] % 3 == i]
        for i in range(3)
    }
    got = {r["stream_id"]: r for r in out}
    assert set(got) == {0, 1, 2}
    for i in range(3):
        assert got[i]["n"] == len(expected[i])  # zero loss
        assert got[i]["id_sum"] == sum(expected[i])  # right shard, intact
    # the landed zone itself: per-stream id sets exactly the served shards
    landed = (
        spark.read.parquet(
            os.path.join(scratch_dir("kcss_sse_multi"), "raw_events")
        )
        .select("stream_id", "id")
        .distinct()
        .collect()
    )
    by_stream = {i: set() for i in range(3)}
    for r in landed:
        by_stream[r["stream_id"]].add(int(r["id"]))
    for i in range(3):
        assert by_stream[i] == set(expected[i])  # no contamination


def test_sse_multi_per_stream_ordering():
    """Client tier of the fan-in: each subscription's events arrive in
    exactly the order its server emitted them, independently per stream."""
    from kafka_connect_sse_spark.sources.sse import SSEClient

    servers, clients = [], []
    per_stream = {0: list(range(0, 30, 3)), 1: list(range(1, 30, 3)),
                  2: list(range(2, 30, 3))}

    def make_handler(ids):
        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                for i in ids:
                    self.wfile.write(
                        f"event: e\nid: {i}\ndata: d{i}\n\n".encode()
                    )
                self.wfile.flush()
                try:
                    for _ in range(300):
                        time.sleep(0.1)
                        self.wfile.write(b": keepalive\n\n")
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass

        return H

    try:
        for i in range(3):
            srv = ThreadingHTTPServer(
                ("127.0.0.1", 0), make_handler(per_stream[i])
            )
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            servers.append(srv)
            c = SSEClient(f"http://127.0.0.1:{srv.server_address[1]}/stream")
            c.start()
            clients.append(c)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and any(
            c.metrics["events.total"] < 10 for c in clients
        ):
            time.sleep(0.1)
        for i, c in enumerate(clients):
            ids = [int(r[1]) for r in c.drain()]
            assert ids == per_stream[i], (i, ids)  # arrival order == served
    finally:
        for c in clients:
            c.stop()
        for srv in servers:
            srv.shutdown()
            srv.server_close()
