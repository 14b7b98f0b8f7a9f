"""SSE client security options — the reference's Phase-3 declared items
(/root/reference/IMPROVEMENT_PLAN.md:60-63: "Add OAuth support",
"Implement advanced TLS/SSL configuration", "Add proxy support"):

* `sse.auth.bearer.token` -> Authorization: Bearer (wins over basic);
* `sse.proxy.url` -> connects route through an HTTP proxy (absolute-URI
  request observed proxy-side);
* `sse.tls.ca.cert.path` -> private CA pinned for https endpoints;
* `sse.tls.insecure.skip.verify` -> explicit opt-out of verification;
  default behavior REJECTS a self-signed server.
"""

from __future__ import annotations

import ssl
import subprocess
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafka_connect_sse_spark.sources.sse import SSEClient, _parse_options


def wait_for(pred, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


class RecordingHandler(BaseHTTPRequestHandler):
    """Serves one SSE event and records each request's path + headers."""

    requests: list = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        type(self).requests.append((self.path, dict(self.headers)))
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        self.wfile.write(b"event: e\nid: 1\ndata: ok\n\n")
        self.wfile.flush()
        time.sleep(2)


@pytest.fixture()
def recording_server():
    RecordingHandler.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), RecordingHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_options_parse_security_block():
    cfg = _parse_options(
        {
            "uri": "https://x/s",
            "sse.auth.bearer.token": "tok123",
            "sse.proxy.url": "http://user:pw@proxy:3128",
            "sse.tls.ca.cert.path": "/tmp/ca.pem",
        }
    )
    assert cfg["bearer_token"] == "tok123"
    assert cfg["proxy_url"] == "http://user:pw@proxy:3128"
    assert cfg["tls_ca_path"] == "/tmp/ca.pem"
    assert cfg["tls_insecure"] is False


def test_bearer_token_header_wins_over_basic(recording_server):
    port = recording_server.server_address[1]
    client = SSEClient(
        f"http://127.0.0.1:{port}/s",
        user="u",
        password="p",
        bearer_token="sekrit",
        retry_initial_ms=5000,
    )
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
    finally:
        client.stop()
    _, hdrs = RecordingHandler.requests[0]
    assert hdrs["Authorization"] == "Bearer sekrit"


def test_proxy_url_routes_connection(recording_server):
    """Point the client at an unreachable origin with the recording stub
    as proxy: an HTTP proxy receives the ABSOLUTE request URI, so seeing
    the full origin URL in the stub's path proves the hop."""
    port = recording_server.server_address[1]
    client = SSEClient(
        "http://origin.invalid:9/stream",
        proxy_url=f"http://127.0.0.1:{port}",
        retry_initial_ms=5000,
    )
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
    finally:
        client.stop()
    path, _ = RecordingHandler.requests[0]
    assert path == "http://origin.invalid:9/stream"


# ---------------------------------------------------------------- TLS tier

@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    """HTTPS SSE stub with a fresh self-signed cert (openssl CLI)."""
    d = tmp_path_factory.mktemp("tls")
    cert, key = d / "cert.pem", d / "key.pem"
    try:
        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-keyout", str(key), "-out", str(cert), "-days", "1",
                "-nodes", "-subj", "/CN=127.0.0.1",
                "-addext", "subjectAltName=IP:127.0.0.1",
            ],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("openssl CLI unavailable — cannot mint test cert")

    class TlsHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            self.wfile.write(b"event: e\nid: 7\ndata: tls-ok\n\n")
            self.wfile.flush()
            time.sleep(2)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), TlsHandler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"https://127.0.0.1:{srv.server_address[1]}/s", str(cert)
    srv.shutdown()
    srv.server_close()


def test_default_rejects_self_signed(tls_server):
    uri, _ = tls_server
    client = SSEClient(uri, retry_initial_ms=50, retry_max_ms=100)
    client.start()
    try:
        assert wait_for(lambda: client.metrics["connection.failed"] >= 1)
        assert client.metrics["events.total"] == 0
        assert "certificate" in str(client._error).lower()
    finally:
        client.stop()


def test_pinned_private_ca_accepts(tls_server):
    uri, cert = tls_server
    client = SSEClient(uri, tls_ca_path=cert, retry_initial_ms=5000)
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
        assert client.drain()[0][:3] == ("e", "7", "tls-ok")
    finally:
        client.stop()


def test_insecure_skip_verify_accepts(tls_server):
    uri, _ = tls_server
    client = SSEClient(uri, tls_insecure=True, retry_initial_ms=5000)
    client.start()
    try:
        assert wait_for(lambda: client.metrics["events.total"] >= 1)
    finally:
        client.stop()
