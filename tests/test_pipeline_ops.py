"""Semantic tests for the training-pipeline extension ops
(operators/pipeline.py) — properties the DuckDB oracle parity check
can't express: chunk reconstruction, sampling determinism, IVF cell
containment and agreement with the exact twin, packing budget bounds.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from kafka_connect_sse_spark.io import load_table, scratch_dir
from kafka_connect_sse_spark.registry import queries
from kafka_connect_sse_spark.operators.pipeline import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from kafka_connect_sse_spark.session import get_spark

    return get_spark(shuffle_partitions=8)


def test_doc_chunk_reconstructs_document(spark):
    """Chunk 0's md5 must equal the md5 of the doc's first CHUNK_TOKENS
    tokens, and the number of chunks must be ceil(n_tokens/stride)."""
    doc = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    toks = doc.text.split(" ")
    chunks = (
        queries()["x_doc_chunk"](spark, SF)
        .filter(F.col("doc_id") == 0)
        .orderBy("chunk_id")
        .collect()
    )
    expect_n = (len(toks) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
    assert len(chunks) == expect_n
    first = " ".join(toks[:CHUNK_TOKENS])
    assert chunks[0].chunk_md5 == hashlib.md5(first.encode()).hexdigest()
    assert chunks[0].chunk_tokens == min(CHUNK_TOKENS, len(toks))
    # stride: chunk i starts at i*stride → last chunk covers the tail
    assert chunks[-1].chunk_tokens == len(toks) - (expect_n - 1) * CHUNK_STRIDE


def test_stratified_sample_is_deterministic_and_near_rate(spark):
    a = {
        (r.source): (r.n_total, r.n_sampled)
        for r in queries()["x_sample_stratified"](spark, SF).collect()
    }
    b = {
        (r.source): (r.n_total, r.n_sampled)
        for r in queries()["x_sample_stratified"](spark, SF).collect()
    }
    assert a == b  # reproducible across runs (hash-based, not rand())
    n_total = sum(t for t, _ in a.values())
    n_samp = sum(s for _, s in a.values())
    assert n_samp / n_total == pytest.approx(4 / 16, abs=0.08)


def test_ivf_probes_own_cell_and_matches_exact_twin(spark):
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in queries()["x_sim_topk_cosine"](spark, SF).collect()
    }
    ivf = queries()["x_sim_topk_ivf"](spark, SF).collect()
    assert len(ivf) > 0
    for r in ivf:
        assert labels[r.query_id] == labels[r.neighbor_id]  # own cell only
        if (r.query_id, r.neighbor_id) in exact:
            assert exact[(r.query_id, r.neighbor_id)] == pytest.approx(
                r.cos_sim, abs=1e-9
            )
    # recall sanity: IVF finds at least one of each query's exact top-k
    hits = sum(1 for r in ivf if (r.query_id, r.neighbor_id) in exact)
    assert hits > 0


def test_seq_pack_budget_bound(spark):
    """Contiguous-fill packing: a pack overflows the budget by at most one
    document, and pack ids start at 0 per stratum."""
    packs = queries()["x_seq_pack"](spark, SF).collect()
    max_doc = (
        load_table(spark, SF, "documents")
        .select(F.max(F.size(F.split("text", " "))).alias("m"))
        .collect()[0]
        .m
    )
    by_lang: dict[str, list] = {}
    for r in packs:
        by_lang.setdefault(r.lang, []).append(r)
        assert r.tokens_in_pack <= PACK_BUDGET + max_doc
        assert r.n_docs >= 1
    for lang, rows in by_lang.items():
        ids = sorted(r.pack_id for r in rows)
        assert ids[0] == 0
        assert ids == list(range(len(ids)))  # contiguous


def test_pii_scrub_counts_match_python(spark):
    import re

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").limit(50).collect()
    }
    got = {
        r.doc_id: r
        for r in queries()["x_pii_scrub"](spark, SF)
        .filter(F.col("doc_id").isin(*docs))
        .collect()
    }
    for doc_id, text in docs.items():
        r = got[doc_id]
        assert r.n_numbers == len(re.findall(r"[0-9]+", text))
        scrub = re.sub(
            r"[0-9]+",
            "<NUM>",
            re.sub(r"[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>", text),
        )
        assert r.scrubbed_len == len(scrub)


def test_embed_quantize_error_bound(spark):
    """int8 quantization invariants: reconstruction error is bounded by
    one quantization step (scale/127), q_sum is bounded by 127*dim, and
    scale really is the max |component|."""
    rows = queries()["x_embed_quantize"](spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.scale >= 0
        step = r.scale / 127 if r.scale else 0.0
        assert r.max_abs_err <= step + 1e-12, (r.vec_id, r.max_abs_err, step)
        assert abs(r.q_sum) <= 127 * 64 + 64  # floor can undershoot by <1


def test_sorted_sink_files_internally_sorted(spark):
    """snk_parquet_sorted: beyond the oracle's overlap=0 pin, every file
    must be internally ts-sorted so footer/row-group stats prune within
    the file too."""
    import os

    import pyarrow.parquet as pq

    from kafka_connect_sse_spark.registry import queries

    row = queries()["snk_parquet_sorted"](spark, SF).collect()[0]
    assert row["overlapping_pairs"] == 0
    out = scratch_dir("kcss_snk_sorted")
    for fname in os.listdir(out):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, fname), columns=["ts"])
        ts = t.column("ts").to_pylist()
        assert ts == sorted(ts), fname


def test_reservoir_sample_stable_under_repartition(spark):
    """The bottom-k hash sample must be identical for any input
    partitioning (the reproducibility contract x_sample_reservoir
    claims)."""
    from pyspark.sql import functions as F

    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.pipeline import RESERVOIR_K

    e = load_table(spark, SF, "events")
    h = F.md5(F.col("event_id").cast("string"))
    base = (
        e.select("event_id", h.alias("h")).orderBy("h", "event_id")
        .limit(RESERVOIR_K).collect()
    )
    shuffled = (
        e.repartition(13, "user_id")
        .select("event_id", h.alias("h"))
        .orderBy("h", "event_id")
        .limit(RESERVOIR_K)
        .collect()
    )
    assert [r["event_id"] for r in base] == [r["event_id"] for r in shuffled]


def test_bloom_filter_has_no_false_negatives(spark):
    """Every true key must pass the bloom probe (false negatives would make
    the prune unsound; false positives are removed by the verify join)."""
    from pyspark.sql import functions as F

    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.registry import queries

    # exact answer via plain semi join
    o = load_table(spark, SF, "orders")
    small = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & F.col("o_orderdate").between("1995-01-01", "1995-06-30")
    ).select("o_orderkey")
    li = load_table(spark, SF, "lineitem")
    exact_n = li.join(
        small, li["l_orderkey"] == small["o_orderkey"], "left_semi"
    ).count()
    got = queries()["q_join_bloom_prune"](spark, SF).collect()[0]
    assert got["n_li"] == exact_n


def test_transitive_closure_matches_pairwise_reachability(spark):
    """Closure rows = all (src, dst) pairs on each per-region chain with
    dist = key-rank distance; verify against a direct pairwise
    construction."""
    from pyspark.sql import functions as F

    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.registry import queries

    n = load_table(spark, SF, "nation").select(
        "n_regionkey", "n_nationkey"
    ).collect()
    by_region = {}
    for r in n:
        by_region.setdefault(r["n_regionkey"], []).append(r["n_nationkey"])
    expected = set()
    for keys in by_region.values():
        keys.sort()
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                expected.add((keys[i], keys[j], j - i))
    got = {
        (r["src"], r["dst"], r["dist"])
        for r in queries()["q_transitive_closure"](spark, SF).collect()
    }
    assert got == expected
