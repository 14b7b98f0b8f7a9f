"""Server-Sent Events wire-format parser (WHATWG HTML spec §9.2.5).

Pure, incremental, and fully unit-testable — the Spark-side replacement for
the Jersey `InboundSseEvent` machinery the reference leans on
(ServerSentEventClient.java:684-712 receives already-parsed events; here we
own the byte stream).

Semantics implemented:
  * `data:` lines accumulate; dispatch joins them with '\n'
  * `event:` sets the event type (default 'message' when absent/empty)
  * `id:` sets the last-event-id; ignored if it contains NUL
  * `retry:` all-digits sets the reconnection delay (ms)
  * lines starting with ':' are comments (heartbeats) — ignored
  * a blank line dispatches; with an empty data buffer nothing is emitted
  * a single leading space after the colon is stripped; field with no colon
    is treated as field name with empty value
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SSEEvent:
    event: str
    data: str
    id: str | None


@dataclass
class SSEParser:
    last_event_id: str | None = None
    retry_ms: int | None = None
    _data_lines: list[str] = field(default_factory=list)
    _event_type: str = ""

    def feed_line(self, line: str) -> SSEEvent | None:
        """Feed one decoded line (no trailing newline). Returns a dispatched
        event, or None."""
        if line == "":
            return self._dispatch()
        if line.startswith(":"):
            return None
        if ":" in line:
            name, _, value = line.partition(":")
            if value.startswith(" "):
                value = value[1:]
        else:
            name, value = line, ""
        if name == "data":
            self._data_lines.append(value)
        elif name == "event":
            self._event_type = value
        elif name == "id":
            if "\x00" not in value:
                self.last_event_id = value
        elif name == "retry":
            if value.isdigit():
                self.retry_ms = int(value)
        # unknown fields are ignored per spec
        return None

    def _dispatch(self) -> SSEEvent | None:
        if not self._data_lines:
            self._event_type = ""
            return None
        ev = SSEEvent(
            event=self._event_type or "message",
            data="\n".join(self._data_lines),
            id=self.last_event_id,
        )
        self._data_lines = []
        self._event_type = ""
        return ev

    def feed_text(self, chunk: str) -> list[SSEEvent]:
        """Convenience for whole-buffer parsing in tests."""
        out = []
        for line in chunk.split("\n"):
            ev = self.feed_line(line.rstrip("\r"))
            if ev is not None:
                out.append(ev)
        return out


def iter_sse_lines(raw_iter):
    """Split an iterator of byte chunks into decoded lines, handling CRLF /
    LF / CR and chunk boundaries."""
    buf = b""
    for chunk in raw_iter:
        buf += chunk
        while True:
            # find earliest line terminator
            i_n = buf.find(b"\n")
            i_r = buf.find(b"\r")
            if i_n == -1 and i_r == -1:
                break
            if i_r != -1 and (i_n == -1 or i_r < i_n):
                # CR or CRLF
                if i_r + 1 == len(buf):
                    break  # might be CRLF split across chunks
                end = i_r + 2 if buf[i_r + 1 : i_r + 2] == b"\n" else i_r + 1
                line, buf = buf[:i_r], buf[end:]
            else:
                line, buf = buf[:i_n], buf[i_n + 1 :]
            yield line.decode("utf-8", errors="replace")
    if buf:
        yield buf.decode("utf-8", errors="replace")
