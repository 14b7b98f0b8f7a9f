"""Self-validation for WEAK-checked operators: the driver only counts their
rows, so these tests pin the semantics the oracle can't."""

import pytest

from pyspark.sql import functions as F

from kafka_connect_sse_spark.io import load_table
from kafka_connect_sse_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_lsh_topk_scores_match_exact_brute_force(spark):
    """Every (query, neighbor) the LSH path returns must carry exactly the
    cosine the brute-force path computes — LSH may miss neighbors (recall),
    never mis-score them."""
    qs = queries()
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in qs["x_sim_topk_cosine"](spark, SF).collect()
    }
    # brute-force keeps only top-5; rebuild full scores for checking
    from kafka_connect_sse_spark.operators.similarity import (
        _as_double,
        dot,
        N_QUERIES,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), _as_double(F.col("embedding")).alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("nid"), _as_double(F.col("embedding")).alias("cv")
    )
    full = {
        (r.qid, r.nid): r.cos
        for r in q.join(c, F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.sqrt(dot(F.col("qv"), F.col("qv")))
                   * F.sqrt(dot(F.col("cv"), F.col("cv")))),
                6,
            ).alias("cos"),
        )
        .collect()
    }
    lsh = qs["x_sim_topk_lsh"](spark, SF).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert full[(r.query_id, r.neighbor_id)] == pytest.approx(r.cos_sim, abs=1e-9)
    # recall sanity: at least one LSH hit is also an exact top-5 hit
    assert any((r.query_id, r.neighbor_id) in exact for r in lsh)


def test_simhash_identical_docs_share_fingerprint(spark):
    """Cloned documents must land in the same simhash bucket."""
    d = load_table(spark, SF, "documents").limit(30).select("doc_id", "text")
    clones = d.withColumn("doc_id", F.col("doc_id") + 10_000)
    both = d.union(clones)
    both.createOrReplaceTempView("simhash_input")

    # rebuild the fingerprint expression over the combined set via the
    # registered op's module internals
    from kafka_connect_sse_spark.operators.dedup import _simhash_bit

    toks = F.array_distinct(F.split(F.col("text"), " "))
    bits = [_simhash_bit(toks, i) for i in range(32)]
    fp = bits[0]
    for b in bits[1:]:
        fp = fp + b
    rows = both.select("doc_id", fp.alias("s")).collect()
    by_id = {r.doc_id: r.s for r in rows}
    for i in range(30):
        if i in by_id:
            assert by_id[i] == by_id[i + 10_000]
    # anti-degeneracy: distinct docs must spread over many fingerprints
    # (the round-1 arity-2-lambda bug collapsed the corpus into 2 buckets)
    assert len(set(by_id.values())) > 10


def test_minhash_threshold_pairs_are_actually_similar(spark):
    """Every pair surviving the verify step has true shingle Jaccard >= 0.5
    (recomputed independently here)."""
    qs = queries()
    pairs = qs["x_dedup_near_minhash"](spark, SF).collect()
    from kafka_connect_sse_spark.operators.dedup import shingles

    d = load_table(spark, SF, "documents")
    sh = {
        r.doc_id: set(r.sh)
        for r in d.select(
            "doc_id", F.array_distinct(shingles(F.col("text"))).alias("sh")
        ).collect()
    }
    for p in pairs:
        a, b = sh[p.doc_a], sh[p.doc_b]
        j = len(a & b) / len(a | b)
        assert j >= 0.5
        assert j == pytest.approx(p.jaccard, abs=1e-6)


def test_approx_distinct_within_error_bound(spark):
    """The op now emits the error-bound check itself as a boolean (so the
    driver's oracle can assert it EXACTLY); the test pins it true."""
    qs = queries()
    rows = qs["q_agg_approx_distinct"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.approx_within_5pct, r


def test_multiprobe_recall_dominates_single_probe(spark):
    """Probing Hamming-1 neighbor buckets must recover at least as many of
    the exact top-5 hits as own-bucket probing — the whole point of the
    recall/cost dial."""
    qs = queries()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["x_sim_topk_cosine"](spark, SF).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in qs["x_sim_topk_lsh"](spark, SF).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in qs["x_sim_topk_lsh_multiprobe"](spark, SF).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)


def test_containment_hot_postings_cap_bounds_lists_keeps_recall(spark):
    """The executable hot-postings cap (containment_dedup(max_df=...),
    VERDICT r6 item 4): on a boilerplate-heavy corpus the cap must (a)
    bound every posting list at max_df — the Σ|postings|² pair-work /
    collect_list memory guard — while (b) recall on genuinely contained
    pairs stays 1.0, because ubiquitous shingles carry no containment
    signal: the pairs that cross CONTAIN_THR do so on discriminative
    shingles, whose document frequency is low by definition."""
    import os

    from kafka_connect_sse_spark.io import scratch_dir
    from kafka_connect_sse_spark.operators.dedup import (
        containment_dedup,
        shingle_array,
    )

    boiler = [f"boiler{i}" for i in range(60)]
    core = [f"core{i}" for i in range(40)]
    docs = [
        # 30 docs sharing a 60-token boilerplate header -> hot shingles
        # with document frequency 30
        (i, "en", "synth", " ".join(boiler + [f"u{i}_{j}" for j in range(30)]))
        for i in range(30)
    ] + [
        # planted contained pair, boilerplate-free on the inner side
        (100, "en", "synth", " ".join(core)),
        (101, "en", "synth",
         " ".join([f"pre{j}" for j in range(20)] + core
                  + [f"post{j}" for j in range(20)])),
    ]
    sf_dir = scratch_dir("kcss_containment_cap")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )

    cap = 5
    # (a) the cap bounds posting-list size: uncapped, the boilerplate
    # shingles hold 30-doc postings; capped, nothing exceeds max_df
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    postings = (
        d.select("doc_id", "lang",
                 F.explode(shingle_array(F.col("text"))).alias("shingle"))
        .groupBy("shingle", "lang")
        .agg(F.count("*").alias("df"))
    )
    assert postings.agg(F.max("df")).collect()[0][0] == 30
    capped_max = (
        postings.filter(F.col("df") <= cap).agg(F.max("df")).collect()[0][0]
    )
    assert capped_max <= cap

    uncapped = {
        (r.inner_id, r.outer_id): r for r in containment_dedup(spark, sf_dir).collect()
    }
    capped = {
        (r.inner_id, r.outer_id): r
        for r in containment_dedup(spark, sf_dir, max_df=cap).collect()
    }
    # (b) recall 1.0 on the planted contained pair, values untouched
    # (none of the inner doc's shingles are hot)
    assert (100, 101) in uncapped and (100, 101) in capped
    assert capped[(100, 101)].containment == 1.0
    assert capped[(100, 101)].n_common == uncapped[(100, 101)].n_common
    # the cap only ever removes shingle evidence -> no new pairs appear
    assert set(capped) <= set(uncapped)
    # boilerplate 50%-overlap pairs never cross the 0.8 threshold
    assert set(uncapped) == {(100, 101)}


def test_ann_stored_index_matches_inline_and_is_int8(spark):
    """The materialized ANN index (round 7) must change WHERE the int8
    codes come from, never WHAT they are: the stored parquet carries
    array<tinyint> codes (the real 4x storage compression), and the
    stored-index pipeline returns row-identical results to the r6
    inline-quantization form."""
    from kafka_connect_sse_spark.operators.similarity import (
        ann_index_path,
        ann_pipeline,
    )

    idx = spark.read.parquet(ann_index_path(spark, SF))
    assert dict(idx.dtypes)["q"] == "array<tinyint>"
    assert idx.count() == spark.read.parquet(SF + "/embeddings.parquet").count()
    stored = {
        tuple(r) for r in ann_pipeline(spark, SF, use_stored_index=True).collect()
    }
    inline = {
        tuple(r) for r in ann_pipeline(spark, SF, use_stored_index=False).collect()
    }
    assert stored == inline
    assert len(stored) > 0


def test_ann_index_cache_misses_on_regenerated_fixture(spark, tmp_path):
    """The build-once index cache is keyed by a freshness fingerprint of
    the source table (mtime+size), not just the corpus path: a fixture
    regenerated in the SAME process must produce a NEW index path, never
    silently serve the stale one (ADVICE r7 item 3)."""
    import os
    import shutil

    from kafka_connect_sse_spark.operators.similarity import ann_index_path

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    src = os.path.join(SF, "embeddings.parquet")
    dst = os.path.join(sf_dir, "embeddings.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    first = ann_index_path(spark, sf_dir)
    assert first == ann_index_path(spark, sf_dir)  # warm hit, same key

    # "regenerate" the fixture: same bytes, new mtime
    targets = (
        [os.path.join(r, f) for r, _d, fs in os.walk(dst) for f in fs]
        if os.path.isdir(dst)
        else [dst]
    )
    for t in targets:
        st = os.stat(t)
        os.utime(t, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))

    second = ann_index_path(spark, sf_dir)
    assert second != first
