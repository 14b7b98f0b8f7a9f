"""Keep the two dependency-gated operators visible: `snk_avro` (needs the
spark-avro jar, which ships outside the pyspark wheel) and
`s_transform_with_state` (transformWithStateInPandas needs the python
protobuf runtime).  Each test SKIPS, naming the missing dependency, in a
container without it — and the day the environment gains the dependency
it flips to a real registration + execution check, so the ops auto-join
the gate instead of silently rotting.
"""

from __future__ import annotations

import pytest

from kafka_connect_sse_spark.operators.sinks import _spark_avro_available
from kafka_connect_sse_spark.registry import queries
from kafka_connect_sse_spark.streaming.queries import _twis_available

SF = "/root/testdata/sf0.001"


def test_snk_avro_registers_when_spark_avro_present():
    if not _spark_avro_available():
        assert "snk_avro" not in queries()
        pytest.skip("spark-avro jar absent from this container")
    q = queries()
    assert "snk_avro" in q
    from kafka_connect_sse_spark.session import get_spark

    assert q["snk_avro"](get_spark(shuffle_partitions=8), SF).count() > 0


def test_transform_with_state_registers_when_protobuf_present():
    if not _twis_available():
        assert "s_transform_with_state" not in queries()
        pytest.skip("python protobuf runtime absent from this container")
    q = queries()
    assert "s_transform_with_state" in q
    from kafka_connect_sse_spark.session import get_spark

    assert q["s_transform_with_state"](get_spark(shuffle_partitions=8), SF).count() > 0
