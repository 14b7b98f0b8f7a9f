"""Dependency-gated surface visibility.

`snk_avro` became UNCONDITIONAL in round 4: when the spark-avro jar is
absent it runs on the pure-Python OCF codec (formats/avro_ocf.py), so
its test asserts registration always and pins which physical path is in
use.  `s_transform_with_state` (transformWithStateInPandas needs the
python protobuf runtime) remains gated: its test SKIPS, naming the
missing dependency, in a container without it — and the day the
environment gains the dependency it flips to a real registration +
execution check, so the op auto-joins the gate instead of silently
rotting.
"""

from __future__ import annotations

import pytest

from kafka_connect_sse_spark.operators.sinks import _spark_avro_available
from kafka_connect_sse_spark.registry import queries
from kafka_connect_sse_spark.streaming.queries import _twis_available

SF = "/root/testdata/sf0.001"


def test_snk_avro_always_registered_and_runs():
    q = queries()
    assert "snk_avro" in q  # unconditional since round 4 (OCF fallback)
    from kafka_connect_sse_spark.session import get_spark

    out = q["snk_avro"](get_spark(shuffle_partitions=8), SF)
    assert out.count() > 0
    if not _spark_avro_available():
        # fallback path active: files on disk are our own OCF output and
        # must parse with the spec-shaped reader
        import glob
        import os

        from kafka_connect_sse_spark.formats.avro_ocf import read_ocf
        from kafka_connect_sse_spark.io import scratch_dir

        files = glob.glob(
            os.path.join(scratch_dir("kcss_snk_avro"), "*.avro")
        )
        assert files
        with open(files[0], "rb") as fh:
            schema, _ = read_ocf(fh.read())
        assert schema["name"] == "orders"


def test_transform_with_state_registers_when_protobuf_present():
    if not _twis_available():
        assert "s_transform_with_state" not in queries()
        pytest.skip("python protobuf runtime absent from this container")
    q = queries()
    assert "s_transform_with_state" in q
    from kafka_connect_sse_spark.session import get_spark

    assert q["s_transform_with_state"](get_spark(shuffle_partitions=8), SF).count() > 0


def test_kafka_sink_registers_when_jar_and_broker_present():
    """snk_kafka_topic (VERDICT r8 item 6): the reference's real output
    surface — a null-key produce to a Kafka topic — registers only where
    BOTH the spark-sql-kafka jar and a declared broker
    ($KCSS_KAFKA_BOOTSTRAP) exist.  Neither does in this sandbox, so the
    op must be invisible; where they do, the test flips to a real
    produce/consume round-trip check."""
    from kafka_connect_sse_spark.operators.sinks import (
        _kafka_bootstrap,
        _kafka_datasource_available,
    )

    if not (_kafka_datasource_available() and _kafka_bootstrap()):
        assert "snk_kafka_topic" not in queries()
        pytest.skip(
            "spark-sql-kafka jar and/or $KCSS_KAFKA_BOOTSTRAP broker "
            "absent from this environment"
        )
    q = queries()
    assert "snk_kafka_topic" in q
    from kafka_connect_sse_spark.session import get_spark

    out = q["snk_kafka_topic"](get_spark(shuffle_partitions=8), SF)
    rows = out.collect()
    assert rows and all(r["keys_all_null"] for r in rows)
