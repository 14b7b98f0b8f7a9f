"""Property-based check of the two-level sequence-packing invariants
(operators/pipeline.py `_pack_local` / `_pack_offsets`):

* no document is lost or duplicated across shards;
* a pack exceeds the budget only by (part of) its final document — i.e.
  tokens_in_pack minus the pack's last doc is strictly under budget
  whenever the pack holds more than one doc;
* global pack ids are dense from 0 within each language;
* the assignment is a pure function of the data: repartitioning the
  input arbitrarily yields the identical (doc_id -> lang, pack_id) map.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from kafka_connect_sse_spark.operators.pipeline import (
    PACK_BUDGET,
    _SHARD_SPARK,
    _pack_local,
    _pack_offsets,
)


@pytest.fixture(scope="module")
def spark():
    from kafka_connect_sse_spark.session import get_spark

    return get_spark(shuffle_partitions=8)


def _assign(spark, rows, n_parts):
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens int"
    ).repartition(n_parts)
    sized = df.withColumn("shard", F.expr(_SHARD_SPARK).cast("int"))
    local = _pack_local(sized)
    out = (
        local.join(
            F.broadcast(_pack_offsets(sized)), ["lang", "shard"]
        )
        .withColumn("pack_id", F.col("pack_off") + F.col("local_pack"))
        .select("doc_id", "lang", "n_tokens", "pack_id")
    )
    return out.collect()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=1, max_value=PACK_BUDGET + 40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_two_level_pack_invariants(spark, docs):  # noqa: F811
    rows = [(i, lang, n) for i, (lang, n) in enumerate(docs)]
    out = _assign(spark, rows, n_parts=3)

    # conservation: every input doc assigned exactly once
    assert sorted(r.doc_id for r in out) == [r[0] for r in rows]

    packs: dict[tuple, list] = {}
    for r in out:
        packs.setdefault((r.lang, r.pack_id), []).append(r)

    for (_lang, _pid), members in packs.items():
        members.sort(key=lambda r: r.doc_id)
        total = sum(r.n_tokens for r in members)
        # before its last doc was added, the pack was strictly under budget
        if len(members) > 1:
            assert total - members[-1].n_tokens < PACK_BUDGET

    # dense global ids from 0 per language
    for lang in {r.lang for r in out}:
        ids = sorted({r.pack_id for r in out if r.lang == lang})
        assert ids == list(range(len(ids)))

    # partition-layout independence: same assignment under 1 partition
    again = {r.doc_id: (r.lang, r.pack_id) for r in _assign(spark, rows, 1)}
    assert {r.doc_id: (r.lang, r.pack_id) for r in out} == again
