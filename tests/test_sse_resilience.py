"""SSE client resilience: reconnection with backoff, idle/zombie health
detection — the behaviors behind ServerSentEventClient.java:587-676
(attemptReconnection/backoff) and :431-452 (health check)."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafka_connect_sse_spark.sources.sse import SSEClient


class FlakyHandler(BaseHTTPRequestHandler):
    """Serves 2 events per connection, then closes — forces reconnects."""

    connections = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_GET(self):
        with type(self).lock:
            type(self).connections += 1
            conn_id = type(self).connections
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        base = (conn_id - 1) * 2
        for i in range(2):
            self.wfile.write(
                f"event: edit\nid: {base + i}\ndata: payload{base + i}\n\n".encode()
            )
        self.wfile.flush()
        # close the connection (server-side stall/drop)


@pytest.fixture()
def flaky_server():
    FlakyHandler.connections = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/stream"
    srv.shutdown()
    srv.server_close()


def wait_for(pred, timeout=15.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_reconnects_and_keeps_consuming(flaky_server):
    client = SSEClient(flaky_server, retry_initial_ms=50, retry_max_ms=100)
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 6)
        rows = client.drain()
        ids = [r[1] for r in rows]
        assert ids == sorted(ids, key=int)  # arrival order preserved
        assert len(set(ids)) == len(ids)  # each event delivered once
        assert client.metrics["connection.successful"] >= 3
        assert client.metrics["connection.reconnections"] >= 2
    finally:
        client.stop()


def test_healthy_flips_after_idle_timeout(flaky_server):
    client = SSEClient(flaky_server, idle_timeout_s=0.5)
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 2)
        assert client.healthy()
        # stop the flow by stopping the reader thread's consumption: just
        # wait out the idle window (server closed; reconnects keep adding,
        # so instead test the pure timer on a stopped client)
    finally:
        client.stop()
    time.sleep(0.6)
    assert not client.healthy()


def test_last_event_id_sent_on_reconnect(flaky_server):
    """After a drop, the reconnect request advertises the last seen id
    (WHATWG SSE); delivery still resumes from 'now' like the reference."""
    seen_ids = []
    orig = FlakyHandler.do_GET

    def patched(self):
        seen_ids.append(self.headers.get("Last-Event-ID"))
        orig(self)

    FlakyHandler.do_GET = patched
    try:
        client = SSEClient(flaky_server, retry_initial_ms=50, retry_max_ms=100)
        client.start()
        assert wait_for(lambda: client.metrics["connection.successful"] >= 3)
        client.stop()
    finally:
        FlakyHandler.do_GET = orig
    assert seen_ids[0] is None  # first connect: no id yet
    assert any(i is not None for i in seen_ids[1:])  # reconnects advertise


class ResumingHandler(BaseHTTPRequestHandler):
    """A fixed 10-event log; each connection serves 3 events then drops.
    HONORS Last-Event-ID: with the header it replays from id+1; without it
    it restarts from the LIVE HEAD (here: skips ahead one extra event per
    reconnect), so a client that fails to advertise the id demonstrably
    loses events."""

    LOG = 10
    PER_CONN = 3
    connections = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_GET(self):
        with type(self).lock:
            type(self).connections += 1
            conn_id = type(self).connections
        last = self.headers.get("Last-Event-ID")
        # no header -> live head has moved PAST the events the client
        # missed while disconnected (4 > PER_CONN, so ids 3 and 7 are
        # unreachable without resume)
        start = int(last) + 1 if last is not None else (conn_id - 1) * 4
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        for i in range(start, min(start + self.PER_CONN, self.LOG)):
            self.wfile.write(
                f"event: edit\nid: {i}\ndata: payload{i}\n\n".encode()
            )
        self.wfile.flush()
        # drop the connection mid-stream (kill between batches)


@pytest.fixture()
def resuming_server():
    ResumingHandler.connections = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), ResumingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/stream"
    srv.shutdown()
    srv.server_close()


def test_resume_from_last_event_id_no_loss_no_dups(resuming_server):
    """Kill the stub mid-stream repeatedly; with resume enabled the client
    walks the server's full log exactly once — no gap (at-least-once
    across reconnects) and no duplicate (ids replay from exactly last+1)."""
    client = SSEClient(resuming_server, retry_initial_ms=20, retry_max_ms=50)
    client.start()
    try:
        assert wait_for(
            lambda: client.metrics["events.total"] >= ResumingHandler.LOG
        )
    finally:
        client.stop()
    ids = [int(r[1]) for r in client.drain()]
    assert ids == list(range(ResumingHandler.LOG))
    assert client.metrics["connection.reconnections"] >= 2


def test_resume_disabled_loses_events(resuming_server):
    """Control: with sse.resume.last.event.id=false the same stub skips
    ahead on every reconnect — events are lost, which is exactly the
    at-most-once behavior the resume option exists to fix."""
    client = SSEClient(
        resuming_server,
        retry_initial_ms=20,
        retry_max_ms=50,
        resume_last_event_id=False,
    )
    client.start()
    try:
        assert wait_for(
            lambda: ResumingHandler.connections >= 3
            and client.metrics["events.total"] >= 6
        )
    finally:
        client.stop()
    ids = [int(r[1]) for r in client.drain()]
    assert 3 not in ids  # skipped while disconnected — lost for good
    assert sorted(set(ids)) != list(range(ResumingHandler.LOG))


def test_gzip_compression_roundtrip():
    """sse.compression=true sends Accept-Encoding and transparently
    decompresses a gzip SSE body (ServerSentEventClient.java:207-210,
    264-267 parity)."""
    import gzip as gz

    class GzipHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            assert "gzip" in (self.headers.get("Accept-Encoding") or "")
            body = gz.compress(b"event: edit\nid: 9\ndata: zipped\n\n")
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            self.wfile.flush()
            time.sleep(1)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), GzipHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = SSEClient(
            f"http://127.0.0.1:{srv.server_address[1]}/s",
            compression=True,
            retry_initial_ms=5000,
        )
        client.start()
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
        rows = client.drain()
        assert rows[0][:3] == ("edit", "9", "zipped")
        client.stop()
    finally:
        srv.shutdown()
        srv.server_close()


def test_url_params_option_appended():
    from kafka_connect_sse_spark.sources.sse import _parse_options

    cfg = _parse_options({"uri": "http://x/s", "sse.params": "since=now&filter=edit"})
    assert cfg["uri"] == "http://x/s?since=now&filter=edit"
    cfg2 = _parse_options({"uri": "http://x/s?a=1", "sse.params": "b=2"})
    assert cfg2["uri"] == "http://x/s?a=1&b=2"


def test_rate_limit_paces_connection_attempts(flaky_server):
    client = SSEClient(
        flaky_server, rate_limit_per_sec=5.0, retry_initial_ms=1, retry_max_ms=1
    )
    t0 = time.monotonic()
    client.start()
    try:
        assert wait_for(lambda: client.metrics["connection.attempts"] >= 4)
        elapsed = time.monotonic() - t0
        # 4 attempts at ≤5/s ⇒ at least ~0.6s of pacing
        assert elapsed >= 0.5, elapsed
    finally:
        client.stop()
