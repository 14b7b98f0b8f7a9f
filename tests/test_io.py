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


def test_scratch_dir_sweeps_dead_pid_siblings_only():
    """atexit never fires on SIGKILL/OOM, so the first call per name
    sweeps orphaned `{name}_<dead pid>` siblings — and must leave
    live-pid and non-pid-suffixed dirs alone (ADVICE r5)."""
    import shutil
    import tempfile

    from kafka_connect_sse_spark.io import scratch_dir

    tmp = tempfile.gettempdir()
    name = "kcss_sweep_unit_test"
    dead_pid = 4194301  # above default pid_max ranges; verify actually dead
    try:
        os.kill(dead_pid, 0)
        return  # pid unexpectedly alive on this host — nothing to assert
    except ProcessLookupError:
        pass
    dead = os.path.join(tmp, f"{name}_{dead_pid}")
    live = os.path.join(tmp, f"{name}_1")  # pid 1 always alive
    nonpid = os.path.join(tmp, f"{name}_notapid")
    for d in (dead, live, nonpid):
        os.makedirs(d, exist_ok=True)
    try:
        p = scratch_dir(name)  # first call for this name → sweep runs
        assert p.endswith(f"_{os.getpid()}")
        assert not os.path.exists(dead), "dead-pid orphan must be swept"
        assert os.path.exists(live), "live-pid sibling must be kept"
        assert os.path.exists(nonpid), "non-pid suffix must be ignored"
    finally:
        for d in (dead, live, nonpid):
            shutil.rmtree(d, ignore_errors=True)


def test_scratch_dir_sweep_skips_longer_names_sharing_prefix():
    """A sweep for `name` must not claim dirs belonging to a LONGER
    scratch name that shares the prefix: `kcss_sweep_pfx_multi_<dead
    pid>` belongs to the name `kcss_sweep_pfx_multi`, so a sweep for
    `kcss_sweep_pfx` has no business removing it even though its owning
    pid is dead (ADVICE r6 — the old rsplit/isdigit check matched it)."""
    import shutil
    import tempfile

    from kafka_connect_sse_spark.io import scratch_dir

    tmp = tempfile.gettempdir()
    name = "kcss_sweep_pfx_unit_test"
    dead_pid = 4194301
    try:
        os.kill(dead_pid, 0)
        return  # pid unexpectedly alive on this host — nothing to assert
    except ProcessLookupError:
        pass
    other_name = os.path.join(tmp, f"{name}_multi_{dead_pid}")
    own_dead = os.path.join(tmp, f"{name}_{dead_pid}")
    for d in (other_name, own_dead):
        os.makedirs(d, exist_ok=True)
    try:
        scratch_dir(name)
        assert not os.path.exists(own_dead), "exact-name dead orphan swept"
        assert os.path.exists(other_name), (
            "dir of a longer name sharing the prefix must be left alone"
        )
    finally:
        for d in (other_name, own_dead):
            shutil.rmtree(d, ignore_errors=True)
