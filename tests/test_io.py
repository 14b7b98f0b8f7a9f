"""io-layer contracts: scratch_dir (round 5)."""

from __future__ import annotations

import os


def test_scratch_dir_is_pid_keyed_and_registered_for_cleanup():
    from kafka_connect_sse_spark.io import _SCRATCH_REGISTERED, scratch_dir

    p = scratch_dir("kcss_unit_test")
    assert p.endswith(f"_{os.getpid()}")
    assert p in _SCRATCH_REGISTERED
    # idempotent: second call returns the same path, registers once
    assert scratch_dir("kcss_unit_test") == p
