"""SSE endurance soak (VERDICT r3 item 7): one long-lived stream —
60+ seconds by default (KCSS_SOAK_SECS overrides) — against an
id-honoring stub at a few thousand events/second, with repeated
server-side drops AND stall connections, asserting ZERO loss and zero
duplication end-to-end via Last-Event-ID resume.

This is the soak-tier companion to tests/test_sse_resilience.py (which
covers the same reconnect/resume logic in seconds): the reference's
idle-watchdog + reconnect semantics (ServerSentEventClient.java:431-452,
587-676) exercised continuously rather than per-scenario.
"""

from __future__ import annotations

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafka_connect_sse_spark.sources.sse import SSEClient

SOAK_SECS = float(os.environ.get("KCSS_SOAK_SECS", "60"))

# server pacing: bursts of BURST events every TICK seconds (~3k ev/s),
# dropping the connection after EVENTS_PER_CONN events; every STALL_EVERYth
# connection sends nothing and stalls past the client read timeout instead
BURST = 150
TICK = 0.05
EVENTS_PER_CONN = 3000
STALL_EVERY = 7
STALL_SECS = 2.0


class SoakHandler(BaseHTTPRequestHandler):
    """Infinite paced event log; honors Last-Event-ID exactly (resume from
    last+1), drops each connection after EVENTS_PER_CONN events, and turns
    every STALL_EVERYth connection into a silent stall (no bytes) to force
    the client's timeout path, not just clean EOF reconnects."""

    connections = 0
    stalls = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_GET(self):
        with type(self).lock:
            type(self).connections += 1
            conn_id = type(self).connections
        last = self.headers.get("Last-Event-ID")
        start = int(last) + 1 if last is not None else 0

        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()

        if conn_id % STALL_EVERY == 0:
            with type(self).lock:
                type(self).stalls += 1
            time.sleep(STALL_SECS)  # zombie connection: headers, no events
            return  # then drop

        sent = 0
        i = start
        try:
            while sent < EVENTS_PER_CONN:
                chunk = []
                for _ in range(BURST):
                    chunk.append(f"event: e\nid: {i}\ndata: d{i}\n\n")
                    i += 1
                    sent += 1
                self.wfile.write("".join(chunk).encode())
                self.wfile.flush()
                time.sleep(TICK)
        except (BrokenPipeError, ConnectionResetError):
            pass
        # drop: client must resume from Last-Event-ID


@pytest.fixture()
def soak_server():
    SoakHandler.connections = 0
    SoakHandler.stalls = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), SoakHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/stream"
    srv.shutdown()
    srv.server_close()


def test_soak_zero_loss_across_drops_and_stalls(soak_server):
    client = SSEClient(
        soak_server,
        retry_initial_ms=20,
        retry_max_ms=100,
        connect_timeout_s=1.0,  # stall connections die via read timeout
        idle_timeout_s=5.0,
        max_buffer=500_000,
    )
    ids: list[int] = []
    t0 = time.monotonic()
    client.start()
    try:
        # drain continuously like a micro-batch reader so the bounded
        # buffer never overflows (events.dropped must stay 0)
        while time.monotonic() - t0 < SOAK_SECS:
            time.sleep(0.2)
            ids.extend(int(r[1]) for r in client.drain())
    finally:
        client.stop()
    ids.extend(int(r[1]) for r in client.drain())
    elapsed = time.monotonic() - t0

    m = client.metrics
    n = len(ids)
    rate = n / elapsed
    print(
        f"\nsoak: {elapsed:.1f}s, {n} events ({rate:.0f} ev/s), "
        f"{m['connection.successful']} connects, "
        f"{m['connection.reconnections']} reconnections, "
        f"{SoakHandler.stalls} stalls, {m['events.dropped']} dropped"
    )

    # endurance floor: the soak genuinely ran long with many reconnects
    assert elapsed >= SOAK_SECS
    assert m["connection.reconnections"] >= 5
    assert SoakHandler.stalls >= 1, "soak never exercised the stall path"

    # throughput floor: well above the reference's ~10 ev/s deployment;
    # the paced stub emits ~3k ev/s minus stall windows
    assert n >= 500 * SOAK_SECS, (n, elapsed)

    # ZERO loss, zero duplication: the received ids are exactly the
    # contiguous prefix of the server's log
    assert m["events.dropped"] == 0
    assert ids == list(range(n)), (
        "gap or duplicate in resumed stream: first divergence at "
        f"{next((k for k, v in enumerate(ids) if v != k), None)}"
    )


def test_soak_fanin_three_sockets_zero_loss():
    """Fan-in endurance (VERDICT r5 item 7): the src_sse_multi topology's
    client tier — THREE independent subscriptions, each against its own
    paced server with forced connection drops AND stall connections,
    soaked concurrently for the same budget as the single-socket test.

    Asserts, per stream: zero buffer drops, many reconnects (the
    resilience machinery genuinely exercised), and the received ids are
    EXACTLY the contiguous prefix of that server's log — zero loss, zero
    duplication, achieved by per-stream Last-Event-ID resume alone.
    Cross-stream isolation: every event's payload carries its server's
    tag, so one byte of contamination between subscriptions fails.  This
    is the resilience companion to the round-5 fan-in throughput A/B:
    scaling subscriptions cannot degrade any single socket's
    exactly-once story."""
    # three servers, each with its OWN handler class (connection/stall
    # counters and payload tag are class attributes) and its own log
    handlers = []
    servers = []
    for s in range(3):
        h = type(
            f"SoakFaninHandler{s}",
            (SoakHandler,),
            {"connections": 0, "stalls": 0, "lock": threading.Lock(), "tag": s},
        )

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            cls = type(self)
            with cls.lock:
                cls.connections += 1
                conn_id = cls.connections
            last = self.headers.get("Last-Event-ID")
            i = int(last) + 1 if last is not None else 0
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            if conn_id % STALL_EVERY == 0:
                with cls.lock:
                    cls.stalls += 1
                time.sleep(STALL_SECS)
                return
            sent = 0
            try:
                while sent < EVENTS_PER_CONN:
                    chunk = []
                    for _ in range(BURST):
                        chunk.append(
                            f"event: e\nid: {i}\ndata: s{cls.tag}-{i}\n\n"
                        )
                        i += 1
                        sent += 1
                    self.wfile.write("".join(chunk).encode())
                    self.wfile.flush()
                    time.sleep(TICK)
            except (BrokenPipeError, ConnectionResetError):
                pass

        h.do_GET = do_GET
        handlers.append(h)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), h)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)

    clients = [
        SSEClient(
            f"http://127.0.0.1:{srv.server_address[1]}/stream",
            retry_initial_ms=20,
            retry_max_ms=100,
            connect_timeout_s=1.0,
            idle_timeout_s=5.0,
            max_buffer=500_000,
        )
        for srv in servers
    ]
    rows: list[list] = [[], [], []]
    t0 = time.monotonic()
    try:
        for c in clients:
            c.start()
        while time.monotonic() - t0 < SOAK_SECS:
            time.sleep(0.2)
            for s, c in enumerate(clients):
                rows[s].extend(c.drain())
    finally:
        for c in clients:
            c.stop()
        for srv in servers:
            srv.shutdown()
            srv.server_close()
    for s, c in enumerate(clients):
        rows[s].extend(c.drain())
    elapsed = time.monotonic() - t0

    total = sum(len(r) for r in rows)
    print(
        f"\nfan-in soak: {elapsed:.1f}s, {total} events total "
        f"({total / elapsed:.0f} ev/s aggregate), per-stream "
        + ", ".join(
            f"s{s}: {len(rows[s])} ev / "
            f"{clients[s].metrics['connection.reconnections']} reconn / "
            f"{handlers[s].stalls} stalls"
            for s in range(3)
        )
    )

    assert elapsed >= SOAK_SECS
    for s in range(3):
        m = clients[s].metrics
        ids = [int(r[1]) for r in rows[s]]
        n = len(ids)
        # each socket soaked for real: reconnects + at least one stall
        assert m["connection.reconnections"] >= 3, (s, m)
        assert handlers[s].stalls >= 1, f"stream {s} never stalled"
        # per-stream throughput floor (3 paced sockets share one process)
        assert n >= 300 * SOAK_SECS, (s, n, elapsed)
        # zero loss, zero duplication per stream
        assert m["events.dropped"] == 0
        assert ids == list(range(n)), (
            f"stream {s}: gap or duplicate, first divergence at "
            f"{next((k for k, v in enumerate(ids) if v != k), None)}"
        )
        # cross-stream isolation: every payload carries THIS server's tag
        assert all(r[2] == f"s{s}-{r[1]}" for r in rows[s]), (
            f"stream {s} received another stream's payload"
        )
