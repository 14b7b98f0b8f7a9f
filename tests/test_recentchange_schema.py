"""RECENTCHANGE_SCHEMA parses the reference's captured live event
(recentchange.json) with every typed field populated — the parity check for
the FromJson SMT tier."""

import json
import os

import pytest

from pyspark.sql import functions as F

from kafka_connect_sse_spark.schemas import (
    RECENTCHANGE_SCHEMA,
    SSE_ENVELOPE_SCHEMA,
    parse_recentchange,
)

REF_SAMPLE = "/root/reference/recentchange.json"

# inline fallback sample (same shape as the reference capture) so the test
# runs standalone
SAMPLE = {
    "$schema": "/mediawiki/recentchange/1.0.0",
    "meta": {
        "uri": "https://en.wikipedia.org/wiki/Example",
        "request_id": "req-1",
        "id": "0b7b1c20-6db6-4c65-ae5b-a35c7f1e0bf4",
        "dt": "2024-01-15T12:34:56Z",
        "domain": "en.wikipedia.org",
        "stream": "mediawiki.recentchange",
    },
    "id": 1234567,
    "type": "edit",
    "title": "Example",
    "namespace": 0,
    "comment": "fix typo",
    "parsedcomment": "fix typo",
    "timestamp": 1705322096,
    "user": "ExampleUser",
    "bot": False,
    "server_url": "https://en.wikipedia.org",
    "server_name": "en.wikipedia.org",
    "server_script_path": "/w",
    "wiki": "enwiki",
    "minor": True,
    "patrolled": False,
    "length": {"old": 100, "new": 120},
    "revision": {"old": 111, "new": 222},
    "log_params": {"some": "object"},
}


def _payloads():
    out = [json.dumps(SAMPLE)]
    if os.path.exists(REF_SAMPLE):
        with open(REF_SAMPLE) as f:
            out.append(f.read())
    return out


def test_parse_recentchange_types_and_event_time(spark):
    rows = [("message", str(i), p) for i, p in enumerate(_payloads())]
    env = spark.createDataFrame(rows, SSE_ENVELOPE_SCHEMA)
    parsed = parse_recentchange(env)
    got = parsed.select(
        "rc.wiki", "rc.type", "rc.bot", "rc.namespace", "rc.length.new",
        "rc.revision.old", "rc.log_params", "event_time", "change_ts",
    ).collect()
    for r in got:
        assert isinstance(r["wiki"], str) and r["wiki"]
        assert r["type"] in ("edit", "new", "log", "categorize", "external")
        assert isinstance(r["bot"], bool)
        assert isinstance(r["namespace"], int)
        assert r["event_time"] is not None  # meta.dt parsed
        assert r["change_ts"] is not None  # epoch parsed
    # polymorphic log_params stays raw JSON text when present
    first = got[0]
    assert first["log_params"] is None or isinstance(first["log_params"], str)


def test_malformed_payload_yields_null_struct_for_dlq(spark):
    env = spark.createDataFrame(
        [("message", "1", "{not json"), ("message", "2", json.dumps(SAMPLE))],
        SSE_ENVELOPE_SCHEMA,
    )
    parsed = parse_recentchange(env)
    bad = parsed.filter(~F.col("rc_valid"))
    good = parsed.filter(F.col("rc_valid"))
    assert bad.count() == 1 and good.count() == 1
    assert good.select("rc.wiki").first()[0] == "enwiki"


def test_schema_matches_reference_json_schema_fields():
    """Every property in the reference's JSON-Schema appears in our
    StructType (field-level parity; skipped when the reference isn't
    present)."""
    ref = "/root/reference/config/wikimedia.recentchange.schema.json"
    if not os.path.exists(ref):
        pytest.skip("reference not available")
    with open(ref) as f:
        props = set(json.load(f)["properties"].keys())
    ours = {f.name for f in RECENTCHANGE_SCHEMA.fields}
    missing = props - ours
    assert not missing, f"schema fields missing: {missing}"
