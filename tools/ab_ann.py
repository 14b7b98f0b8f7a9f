"""A/B: stored int8 ANN index vs inline re-quantization (VERDICT r6 item 3).

x_ann_pipeline's r6 form re-quantized the full fp embedding base inside
every query plan — PLANS.md's stage attribution named that inline
quantization as the remaining O(N) floor once the IVF prefilter removed
the pair-count term.  Round 7 materializes the index (similarity.
ann_index_path: x_embed_quantize's codes stored as array<tinyint>
parquet + cell assignment), so the steady-state query reads stored codes.

Three variants of the identical logical query (all return identical rows):

  rerank_inline    x_ann_rerank — no prefilter, inline quantization:
                   the O(N·|Q|) quantize+scan baseline
  pipeline_inline  r6 x_ann_pipeline — IVF prefilter, but re-quantizes
                   the full base inline per query
  pipeline_stored  r7 x_ann_pipeline — IVF prefilter over the stored
                   int8 index (build excluded: amortized at ingest,
                   measured separately as build_s)

Usage: python tools/ab_ann.py [--sf DIR] [--runs 3] [--record]
--record appends to tools/ab_ann_results.json (rendered into PLANS.md
by tools/gen_plans.py).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from kafka_connect_sse_spark.operators.similarity import (
        ann_index_path,
        ann_pipeline,
    )
    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # build once up front and time it — the stored variant's queries must
    # not pay (or hide) the build
    t0 = time.monotonic()
    ann_index_path(spark, args.sf)
    build_s = round(time.monotonic() - t0, 3)

    variants = {
        "rerank_inline": lambda: qs["x_ann_rerank"](spark, args.sf),
        "pipeline_inline": lambda: ann_pipeline(
            spark, args.sf, use_stored_index=False
        ),
        "pipeline_stored": lambda: ann_pipeline(
            spark, args.sf, use_stored_index=True
        ),
    }
    rec = {"sf": args.sf, "build_s": build_s, "variants": {}}
    results = {}
    for name, fn in variants.items():
        times = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            rows = fn().collect()
            times.append(round(time.monotonic() - t0, 3))
        results[name] = {tuple(r) for r in rows}
        rec["variants"][name] = {
            "median_s": statistics.median(times),
            "times": times,
            "rows": len(rows),
        }
    # pipeline variants are bit-identical; rerank differs only in recall
    # (no prefilter) — assert the invariant that justifies the A/B
    assert results["pipeline_inline"] == results["pipeline_stored"], (
        "stored-index pipeline diverged from inline form"
    )
    print(json.dumps(rec))

    if args.record:
        path = os.path.join(os.path.dirname(__file__), "ab_ann_results.json")
        recs = json.load(open(path)) if os.path.exists(path) else []
        recs = [r for r in recs if r["sf"] != args.sf] + [rec]
        with open(path, "w") as fh:
            json.dump(recs, fh, indent=1)
        print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
