"""Backoff schedule parity with the reference
(calculateBackoffDelay: ServerSentEventClient.java:646-654, defaults
ServerSentEventsSourceConnectorConfig.java:151-171; 429 inflation
isRateLimitError: ServerSentEventClient.java:662-676)."""

from kafka_connect_sse_spark.sources.sse import backoff_delay_ms


def test_schedule_doubles_from_initial():
    assert [backoff_delay_ms(a) for a in (1, 2, 3, 4)] == [2000, 4000, 8000, 16000]


def test_caps_at_max():
    assert backoff_delay_ms(5) == 30000
    assert backoff_delay_ms(50) == 30000


def test_rate_limited_doubles_within_cap():
    assert backoff_delay_ms(1, rate_limited=True) == 4000
    assert backoff_delay_ms(4, rate_limited=True) == 30000


def test_custom_initial_and_cap():
    assert backoff_delay_ms(3, initial_ms=100, max_ms=1000) == 400
    assert backoff_delay_ms(10, initial_ms=100, max_ms=1000) == 1000


def test_attempt_floor():
    assert backoff_delay_ms(0) == 2000
    assert backoff_delay_ms(-3) == 2000
