"""Unit tests for the SSE wire-format parser (SURVEY.md §5.2 item 1 — the
Spark-side analogue of ServerSentEventClientTest's event-handling tests)."""

from hypothesis import given
from hypothesis import strategies as st

from kafka_connect_sse_spark.sources.sse_wire import SSEParser, iter_sse_lines


def parse(text):
    return SSEParser().feed_text(text)


def test_simple_event():
    evs = parse("data: hello\n\n")
    assert len(evs) == 1
    assert evs[0].event == "message"
    assert evs[0].data == "hello"
    assert evs[0].id is None


def test_named_event_with_id():
    evs = parse("event: edit\nid: 42\ndata: payload\n\n")
    assert evs[0].event == "edit"
    assert evs[0].id == "42"
    assert evs[0].data == "payload"


def test_multiline_data_joined_with_newline():
    evs = parse("data: line1\ndata: line2\n\n")
    assert evs[0].data == "line1\nline2"


def test_comment_lines_ignored():
    evs = parse(": heartbeat\n: another\ndata: x\n\n")
    assert len(evs) == 1
    assert evs[0].data == "x"


def test_blank_line_without_data_emits_nothing():
    assert parse("\n\n\n") == []
    assert parse("event: orphan\n\n") == []


def test_retry_field_sets_delay():
    p = SSEParser()
    p.feed_text("retry: 5000\ndata: x\n\n")
    assert p.retry_ms == 5000


def test_retry_non_numeric_ignored():
    p = SSEParser()
    p.feed_text("retry: soon\ndata: x\n\n")
    assert p.retry_ms is None


def test_id_with_nul_ignored():
    p = SSEParser()
    evs = p.feed_text("id: bad\x00id\ndata: x\n\n")
    assert evs[0].id is None


def test_id_persists_across_events():
    evs = parse("id: 1\ndata: a\n\ndata: b\n\n")
    assert [e.id for e in evs] == ["1", "1"]


def test_field_without_colon_is_empty_value():
    # "data" alone = data field with empty value
    evs = parse("data\ndata: x\n\n")
    assert evs[0].data == "\nx"


def test_leading_space_stripped_once():
    evs = parse("data:  two spaces\n\n")
    assert evs[0].data == " two spaces"


def test_unknown_fields_ignored():
    evs = parse("wat: ever\ndata: x\n\n")
    assert evs[0].data == "x"


def test_iter_sse_lines_crlf_and_chunk_boundaries():
    raw = b"data: a\r\ndata: b\n\r\nevent: t\ndata: c\n\n"
    # feed byte-at-a-time to stress chunk-boundary handling
    lines = list(iter_sse_lines(bytes([b]) for b in raw))
    evs = []
    p = SSEParser()
    for ln in lines:
        ev = p.feed_line(ln)
        if ev:
            evs.append(ev)
    assert evs[0].data == "a\nb"
    assert evs[1].event == "t"
    assert evs[1].data == "c"


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["message", "edit", "log"]),
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\n\r\x00", blacklist_categories=("Cs",)
                ),
                max_size=50,
            ),
        ),
        max_size=20,
    )
)
def test_roundtrip_serialize_parse(events):
    """Any (event, data) list serialized to wire format parses back
    identically (data lines themselves contain no newlines here; multi-line
    payloads are covered by the explicit test above)."""
    wire = "".join(f"event: {e}\ndata: {d}\n\n" for e, d in events)
    parsed = parse(wire)
    assert [(p.event, p.data) for p in parsed] == [
        (e if e else "message", d) for e, d in events
    ]
