"""SSE circuit breaker — the reference's Step-11 declared items
(/root/reference/IMPROVEMENT_PLAN.md:70-73: failure threshold detection,
backoff strategies, alerting capability):

* after `sse.circuit.breaker.threshold` CONSECUTIVE connect failures the
  breaker opens: no attempts for cooldown, then one half-open probe;
* a successful probe closes it and ingestion resumes (recovery);
* transitions fire the alert hook with failure context;
* threshold 0 (default) disables the breaker entirely.
"""

from __future__ import annotations

import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from kafka_connect_sse_spark.sources.sse import SSEClient, _parse_options


def wait_for(pred, timeout=15.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_options_parse_breaker_block():
    cfg = _parse_options(
        {
            "uri": "http://x/s",
            "sse.circuit.breaker.threshold": "4",
            "sse.circuit.breaker.cooldown.s": "7.5",
        }
    )
    assert cfg["cb_threshold"] == 4
    assert cfg["cb_cooldown_s"] == 7.5
    assert _parse_options({"uri": "http://x/s"})["cb_threshold"] == 0


def test_breaker_opens_and_pauses_attempts():
    """Dead endpoint: the breaker opens at the threshold and connection
    attempts stop for the cooldown window."""
    alerts = []
    client = SSEClient(
        f"http://127.0.0.1:{free_port()}/s",  # nothing listening
        retry_initial_ms=1,
        retry_max_ms=2,
        cb_threshold=3,
        cb_cooldown_s=1.0,
        alert_fn=lambda t, info: alerts.append((t, info)),
    )
    client.start()
    try:
        assert wait_for(lambda: client.metrics["circuit.opens"] >= 1)
        attempts_at_open = client.metrics["connection.attempts"]
        assert attempts_at_open >= 3
        assert client.circuit_state() == "open"
        time.sleep(0.5)  # mid-cooldown: no new attempts
        assert client.metrics["connection.attempts"] == attempts_at_open
        # after cooldown the half-open probe fails and it re-opens
        assert wait_for(lambda: client.metrics["circuit.opens"] >= 2, 5.0)
    finally:
        client.stop()
    kinds = [t for t, _ in alerts]
    assert kinds[0] == "open"
    assert alerts[0][1]["consecutive_failures"] == 3
    assert alerts[0][1]["error"] is not None


def test_breaker_recovers_when_endpoint_returns():
    """Endpoint dead at start -> breaker opens; the server then comes up
    on the same port -> the half-open probe succeeds, the breaker closes
    (alerted), and events flow."""
    port = free_port()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            self.wfile.write(b"event: e\nid: 1\ndata: back\n\n")
            self.wfile.flush()
            time.sleep(2)

    alerts = []
    client = SSEClient(
        f"http://127.0.0.1:{port}/s",
        retry_initial_ms=1,
        retry_max_ms=2,
        cb_threshold=3,
        cb_cooldown_s=0.5,
        alert_fn=lambda t, info: alerts.append(t),
    )
    client.start()
    srv = None
    try:
        assert wait_for(lambda: client.metrics["circuit.opens"] >= 1)
        srv = ThreadingHTTPServer(("127.0.0.1", port), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
        assert client.circuit_state() == "closed"
        assert client.healthy()
    finally:
        client.stop()
        if srv is not None:
            srv.shutdown()
            srv.server_close()
    assert "open" in alerts and "closed" in alerts


def test_breaker_disabled_by_default_keeps_retrying():
    client = SSEClient(
        f"http://127.0.0.1:{free_port()}/s",
        retry_initial_ms=1,
        retry_max_ms=2,
    )
    client.start()
    try:
        assert wait_for(lambda: client.metrics["connection.failed"] >= 6)
        assert client.metrics["circuit.opens"] == 0
        assert client.circuit_state() == "closed"
    finally:
        client.stop()
