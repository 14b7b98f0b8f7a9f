"""End-to-end embedding-index build + retrieval on the similarity tier.

The chain a production vector-search deployment runs, here runnable at
any fixture SF:

    embeddings
      -> hygiene           (norms/dim validation; x_embed_norms)
      -> int8 quantization (4x memory/IO; x_embed_quantize's quantizer)
      -> coarse index      (IVF cells / LSH buckets; x_sim_topk_ivf,
                            x_sim_lsh_bucketed families)
      -> retrieval         (two-stage: int8 shortlist -> exact fp64
                            re-rank, x_ann_rerank; and the full
                            three-stage IVF->int8->fp64 form,
                            x_ann_pipeline — which since round 7 reads
                            a MATERIALIZED build-once array<tinyint>
                            index, similarity.ann_index_path: the
                            first pipeline call here pays the build,
                            repeat queries scan the stored codes)
      -> near-dup audit    (embedding-cosine duplicate pairs over the
                            LSH-bucketed candidate graph)

Every stage is the EXACT-oracle-checked operator from the registry; this
script only composes them and prints per-stage row counts plus a
recall@k comparison of the two-stage path against the exact brute-force
baseline (x_sim_topk_cosine).  Usage:

    python examples/ann_index_pipeline.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_sse_spark.registry import queries  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    hygiene = qs["x_embed_norms"](spark, args.sf_dir)
    print(f"hygiene: {hygiene.count()} vectors validated")

    quantized = qs["x_embed_quantize"](spark, args.sf_dir)
    bad = quantized.filter("max_abs_err > scale / 127").count()
    print(f"quantize: {quantized.count()} vectors, {bad} outside error bound")

    # collect the IVF exact results once: they serve both the probe count
    # and the three-stage baseline below (no second scoring job)
    ivf_rows = qs["x_sim_topk_ivf"](spark, args.sf_dir).collect()
    print(f"ivf probe: {len(ivf_rows)} (query, neighbor) results")
    baselines = {
        "x_sim_topk_ivf": {
            (r["query_id"], r["neighbor_id"]) for r in ivf_rows
        },
        "x_sim_topk_cosine": {
            (r["query_id"], r["neighbor_id"])
            for r in qs["x_sim_topk_cosine"](spark, args.sf_dir).collect()
        },
    }

    # each retrieval form against ITS exact baseline: the two-stage
    # rerank scans the whole corpus, so its truth is the global
    # brute-force top-k; the three-stage form restricts to the query's
    # IVF cell BY DESIGN, so its truth is the exact same-cell top-k
    # (x_sim_topk_ivf) — comparing it to the global baseline would
    # measure the fixture's label assignment, not the operator
    for op, baseline, label in (
        ("x_ann_rerank", "x_sim_topk_cosine", "two-stage rerank"),
        ("x_ann_pipeline", "x_sim_topk_ivf", "three-stage ivf->int8->fp64"),
    ):
        truth = baselines[baseline]
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in qs[op](spark, args.sf_dir).collect()
        }
        recall = len(got & truth) / len(truth) if truth else 1.0
        print(
            f"{label}: {len(got)} results, "
            f"recall@k vs exact {baseline} = {recall:.3f}"
        )

    dups = qs["x_dedup_near_embedding_lsh"](spark, args.sf_dir)
    print(f"near-dup audit: {dups.count()} duplicate pairs flagged")

    spark.stop()


if __name__ == "__main__":
    main()
