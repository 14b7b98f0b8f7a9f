"""Behavioral pins for the round-13 operators.

x_decontaminate_semantic_lsh: precision is exact by construction (every
flag re-verifies the true cosine); recall is the sign-LSH collision
probability at the target similarity — high at contamination-level
similarity, low at the fixture's deliberately weak 0.35 threshold.
Both claims are pinned here rather than asserted in prose.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_decon_flags_are_subset_of_dense(spark):
    """Precision: every LSH flag must also be a dense flag (the LSH path
    only ever narrows candidates; it cannot invent similarity), and its
    max_cos can only be <= the dense max (the true nearest eval may sit
    outside the probed buckets)."""
    from kafka_connect_sse_spark import registry

    registry.load_all()
    dense = {
        r["vec_id"]: r["max_cos"]
        for r in registry.QUERIES["x_decontaminate_semantic"](
            spark, SF_DIR
        ).collect()
    }
    lsh = {
        r["vec_id"]: r["max_cos"]
        for r in registry.QUERIES["x_decontaminate_semantic_lsh"](
            spark, SF_DIR
        ).collect()
    }
    assert lsh, "LSH screen must flag something on the fixture"
    assert set(lsh) <= set(dense), "LSH flagged a vector dense did not"
    assert all(lsh[v] <= dense[v] for v in lsh)


def test_lsh_decon_recalls_planted_contamination(spark, tmp_path):
    """Recall at the similarity the screen EXISTS for: plant 30 corpus
    vectors that are tiny perturbations of eval vectors (cos ~0.99,
    theta ~8 deg -> P(Hamming<=1) ~0.95 per the docstring math) and
    require >=80% of them flagged through the bucketed path."""
    from kafka_connect_sse_spark.operators.similarity import (
        SEM_DECON_N_EVAL,
        x_decontaminate_semantic_lsh,
    )

    src = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rows = src.orderBy("vec_id").limit(SEM_DECON_N_EVAL).collect()
    planted = []
    vid = 10_000
    for i in range(30):
        base = list(rows[i % SEM_DECON_N_EVAL]["embedding"])
        # deterministic small perturbation: +2% on three components
        for j in (i % 64, (i * 7 + 3) % 64, (i * 13 + 11) % 64):
            base[j] = float(base[j]) * 1.02 + 0.01
        planted.append((vid + i, [float(x) for x in base], 0))
    planted_df = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label int"
    )
    all_df = src.unionByName(planted_df)
    out = os.path.join(str(tmp_path), "embeddings.parquet")
    all_df.write.mode("overwrite").parquet(out)
    flagged = {
        r["vec_id"]
        for r in x_decontaminate_semantic_lsh(spark, str(tmp_path))
        .filter(F.col("vec_id") >= vid)
        .collect()
    }
    recall = len(flagged) / 30
    assert recall >= 0.8, (
        f"planted-contamination recall {recall:.2f} < 0.8 "
        f"(flagged {sorted(flagged)})"
    )


def test_lsh_decon_candidate_volume_is_bucket_bounded(spark):
    """The scale claim: scored candidates must be a small fraction of the
    |corpus| x |evals| dense pair count (E[bucket] = N/2^8 per probe,
    (1+8) probes per eval)."""
    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.similarity import (
        N_PLANES,
        SEM_DECON_N_EVAL,
        _PROBE_MASKS,
        _as_double,
        lsh_code,
    )
    from pyspark.sql.functions import broadcast

    e = load_table(spark, SF_DIR, "embeddings")
    coded = e.select(
        "vec_id", lsh_code(_as_double(F.col("embedding"))).alias("code")
    )
    probes = (
        coded.filter(F.col("vec_id") < SEM_DECON_N_EVAL)
        .select(F.col("vec_id").alias("eval_id"), F.col("code").alias("qcode"))
        .withColumn(
            "pcode",
            F.explode(
                F.array(
                    *[F.col("qcode").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS]
                )
            ),
        )
    )
    n_corpus = coded.filter(F.col("vec_id") >= SEM_DECON_N_EVAL).count()
    n_cand = (
        coded.filter(F.col("vec_id") >= SEM_DECON_N_EVAL)
        .join(broadcast(probes), F.col("code") == F.col("pcode"))
        .count()
    )
    dense_pairs = n_corpus * SEM_DECON_N_EVAL
    # expected fraction = (1 + N_PLANES)/2^N_PLANES ~ 3.5%; allow 3x slack
    assert n_cand < dense_pairs * 3 * (1 + N_PLANES) / 2**N_PLANES, (
        n_cand,
        dense_pairs,
    )
