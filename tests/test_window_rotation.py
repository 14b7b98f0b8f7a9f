"""Rotation-policy pin (VERDICT r12 item 7).

The driver's correctness gate checks the FIRST 50 registry entries each
round.  From round 13 the ordering is computed by
``registry.window_order()``: (a) every op with no green driver record
leads, then (b) oldest-record-first.  This test RE-DERIVES the expected
window from the committed CORRECTNESS_r*.json files with an independent
implementation and pins the registry prefix against it — if a recordless
op is ever omitted from the window, or the oldest-first order drifts,
this fails loudly instead of silently burning the round's freshness
evidence.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from kafka_connect_sse_spark import registry

ROOT = Path(__file__).resolve().parents[1]


def _independent_newest_record() -> dict[str, int]:
    # deliberately NOT calling registry.driver_record_rounds(): the point
    # is a second implementation of the same policy.
    newest: dict[str, int] = {}
    for path in ROOT.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for op, rec in json.loads(path.read_text()).items():
            green = (
                isinstance(rec, dict)
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") in (True, None)
                and not rec.get("err")
            )
            if green and newest.get(op, -1) < rnd:
                newest[op] = rnd
    return newest


@pytest.fixture(scope="module")
def qs():
    registry.load_all()
    return registry.queries()


def test_window_is_recordless_then_oldest_first(qs):
    newest = _independent_newest_record()
    expected = sorted(qs, key=lambda op: (newest.get(op, -1), op))
    window = list(qs)[: registry.WINDOW_SIZE]
    assert window == expected[: registry.WINDOW_SIZE]
    # and the whole registry ordering follows the policy, not just the prefix
    assert list(qs) == expected


def test_every_recordless_op_is_seated(qs):
    """Structural zero-attestation-debt: an op without a driver record
    MUST be inside the 50-entry window (if ever >50 ops are recordless
    at once, this fails and the round must split the debt explicitly)."""
    newest = _independent_newest_record()
    recordless = [op for op in qs if op not in newest]
    window = set(list(qs)[: registry.WINDOW_SIZE])
    missing = [op for op in recordless if op not in window]
    assert not missing, f"recordless ops outside the driver window: {missing}"


def test_window_ops_carry_exact_oracles(qs):
    """Every window seat must be an EXACT gate (hash compare), not a
    rows-only check — same invariant the r12 hand-built window pinned."""
    osql = registry.oracle_sql()
    window = list(qs)[: registry.WINDOW_SIZE]
    rows_only = [op for op in window if op not in osql]
    assert not rows_only, f"window ops without a DuckDB oracle: {rows_only}"


def test_registry_and_test_agree_on_records(qs):
    """The registry's own record reader and this test's independent one
    must see the same attestation history."""
    assert registry.driver_record_rounds() == _independent_newest_record()
